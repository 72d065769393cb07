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


def test_speculative_contact_stops_at_touchdown():
    """PhysX contactOffset semantics (engine._detect_contacts docstring): a
    contact still separated by a gap < contact_offset constrains the approach
    velocity to vn >= -gap/dt, so a body whose contact forms mid-tick stops
    exactly at touchdown instead of penetrating until the next narrow phase.
    With contact_offset=0 the same gap contact is inactive (legacy strict-
    penetration behavior)."""
    from ase_tpu.physics import solver2
    from ase_tpu.physics.collision import Contacts

    m = 2.0                       # kg point mass
    gap = 0.01                    # 1 cm below contact_offset
    dt = 1.0 / 120.0
    v_in = -2.0                   # m/s approaching

    contacts = Contacts(
        pos=jnp.zeros((1, 1, 3)),
        normal=jnp.asarray([[[0.0, 0.0, 1.0]]]),
        depth=jnp.asarray([[-gap]]),
        body_a=jnp.zeros((1, 1), jnp.int32),
        body_b=jnp.full((1, 1), -1, jnp.int32),
        friction=jnp.zeros((1, 1)),
    )
    A = jnp.eye(3)[None] / m      # component-grouped Delassus of a point mass
    v0f = jnp.asarray([[v_in, 0.0, 0.0]])   # [n | t1 | t2]

    cfg = solver.SolverConfig(contact_offset=0.02, matvec_bf16=False)
    lam = solver2.jacobi_lambda(contacts, A, v0f, dt, cfg)
    vn_post = float(v0f[0, 0] + (A[0] @ lam[0])[0])
    # allowed to keep approaching at exactly gap/dt (touchdown at substep end)
    np.testing.assert_allclose(vn_post, -gap / dt, rtol=1e-3)

    cfg0 = solver.SolverConfig(contact_offset=0.0, matvec_bf16=False)
    lam0 = solver2.jacobi_lambda(contacts, A, v0f, dt, cfg0)
    np.testing.assert_allclose(np.asarray(lam0), 0.0, atol=1e-9)


def test_speculative_selection_prioritizes_penetrating():
    """collision3's two-pass compaction: when penetrating + gap candidates
    exceed the contact budget K, every penetrating contact keeps a slot and
    only speculative (gap) candidates are dropped."""
    import types
    from ase_tpu.physics import collision3

    # exercise the selection logic through detect_batched is heavy; replicate
    # the exact compaction math on a synthetic depth row instead
    k = 4
    depth = jnp.asarray(
        [[-0.01, 0.5, -0.005, 0.3, 0.2, -0.002, 0.1, -0.015]])
    margin = 0.02
    pen = depth > 0.0
    rank_p = jnp.cumsum(pen, axis=1, dtype=jnp.int32) - 1
    js = jnp.arange(k, dtype=jnp.int32)[None, :, None]
    onehot = pen[:, None, :] & (rank_p[:, None, :] == js)
    gap = (depth <= 0.0) & (depth > -margin)
    n_pen = jnp.sum(pen, axis=1, dtype=jnp.int32)
    rank_g = jnp.cumsum(gap, axis=1, dtype=jnp.int32) - 1 + n_pen[:, None]
    onehot = onehot | (gap[:, None, :] & (rank_g[:, None, :] == js))
    sel = np.asarray(onehot[0].argmax(axis=1))       # slot -> candidate idx
    filled = np.asarray(onehot[0].any(axis=1))
    # all four penetrating candidates (indices 1, 3, 4, 6) claim the slots;
    # no gap candidate survives
    assert filled.all()
    assert sorted(sel.tolist()) == [1, 3, 4, 6]
