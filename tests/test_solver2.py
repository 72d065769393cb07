"""Pins the component-grouped contact pipeline (solver2 + engine cg branch)
to the block-ordered reference path in f32 (bf16 matvec off: the two paths
sum in different orders, so exact comparison needs f32)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ase_tpu.ops import quat as rot
from ase_tpu.physics import engine, mjcf, solver

import os as _os
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

ASSETS = [
    ("amp_humanoid_sword_shield.xml", 0.89),
    ("amp_humanoid.xml", 0.85),
]


@pytest.mark.parametrize("asset,z", ASSETS)
def test_cg_contact_pipeline_matches_block(asset, z):
    m = mjcf.load_mjcf(_REPO + f"/data/assets/mjcf/{asset}")
    cfg = engine.SimConfig(
        enable_self_collision=True,
        max_contacts=24,
        solver=solver.SolverConfig(matvec_bf16=False),
    )
    B = 8
    st = engine.batch_default_state(m, B)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    st = st._replace(
        root_pos=st.root_pos.at[:, 2].set(z - 0.15 * jax.random.uniform(k1, (B,))),
        joint_q=rot.quat_unit(
            st.joint_q + 0.1 * jax.random.normal(k2, st.joint_q.shape)
        ),
    )
    act = jnp.zeros((B, m.nd))
    old = os.environ.get("ASE_TPU_CONTACT_AOS")
    try:
        os.environ["ASE_TPU_CONTACT_AOS"] = "1"
        a = jax.jit(engine.make_batched_step(m, cfg))(st, act)
        os.environ["ASE_TPU_CONTACT_AOS"] = "0"
        c = jax.jit(engine.make_batched_step(m, cfg))(st, act)
    finally:
        if old is None:
            os.environ.pop("ASE_TPU_CONTACT_AOS", None)
        else:
            os.environ["ASE_TPU_CONTACT_AOS"] = old
    umax = float(jnp.abs(a.state.u).max())
    np.testing.assert_allclose(
        np.asarray(c.state.u), np.asarray(a.state.u), atol=5e-4 * umax
    )
    fmax = float(jnp.abs(a.contact_forces).max()) + 1e-9
    np.testing.assert_allclose(
        np.asarray(c.contact_forces), np.asarray(a.contact_forces),
        atol=1e-3 * fmax,
    )


def test_contact_jacobian_bl_matches_batch_first():
    """contact_jacobian_t_bl (born batch-last) == transpose of the batch-
    first builder, articulation + prop blocks, on real strike-env contacts."""
    from ase_tpu.envs import parse_task
    from ase_tpu.physics import collision3, dynamics, dynamics2, solver2
    from tests.test_env import make_cfg

    cfg = make_cfg(
        strikeBodyNames=["sword", "right_hand", "right_lower_arm"],
        enableTaskObs=True, stateInit="Default", numEnvs=4,
    )
    env = parse_task("HumanoidStrike", cfg)
    m = env.model
    state = env.initial_state(jax.random.PRNGKey(0))
    # a couple of steps so the character loads its contacts
    for _ in range(2):
        state = jax.jit(env.step)(state, jnp.zeros((4, m.nd)))
    phys = state.phys
    kin = dynamics2.fk_batched(m, phys)
    h = 1.0 / 120.0
    _, _, Phi = dynamics2.compute_dynamics_batch_last(m, phys, kin, h)
    Amask = jnp.asarray(dynamics.ancestor_mask(m))
    tables = env._tables
    contacts = collision3.detect_batched(
        m, tables.soa, kin.body_quat, kin.body_pos, phys.prop_quat,
        phys.prop_pos, env.sim_cfg.max_contacts)

    JT = solver2.contact_jacobian_t(
        m, contacts, Phi, Amask, phys.root_pos, phys.prop_pos)
    JT_bl, JT_prop = solver2.contact_jacobian_t_bl(
        m, contacts, Phi, Amask, phys.root_pos, phys.prop_pos)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(JT_bl, (2, 0, 1))),
        np.asarray(JT[:, : m.nu, :]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(JT_prop), np.asarray(JT[:, m.nu :, :]), atol=1e-5)
