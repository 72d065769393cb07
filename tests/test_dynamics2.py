"""Pins the batch-last (SoA) dynamics assembly to the vmapped reference
implementation on random poses/velocities for both humanoid assets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ase_tpu.ops import quat as rot
from ase_tpu.physics import dynamics, dynamics2, engine, mjcf

import os as _os
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

ASSETS = [
    _REPO + "/data/assets/mjcf/amp_humanoid_sword_shield.xml",
    _REPO + "/data/assets/mjcf/amp_humanoid.xml",
]


@pytest.mark.parametrize("asset", ASSETS)
def test_batch_last_dynamics_matches_reference(asset):
    m = mjcf.load_mjcf(asset)
    B = 12
    st = engine.batch_default_state(m, B)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(5), 4)
    st = st._replace(
        root_pos=st.root_pos.at[:, 2].set(0.5 + jax.random.uniform(k1, (B,))),
        root_quat=rot.quat_unit(jax.random.normal(k2, (B, 4))),
        joint_q=rot.quat_unit(jax.random.normal(k3, st.joint_q.shape)),
        u=st.u.at[:, : m.nu].set(jax.random.normal(k4, (B, m.nu))),
    )
    kin = jax.vmap(lambda s: dynamics.fk(m, s))(st)
    h = 1.0 / 120.0
    ref = jax.vmap(lambda a, b: dynamics.compute_dynamics(m, a, b, h))(st, kin)
    M_bl, bias, Phi = jax.jit(
        lambda s, k: dynamics2.compute_dynamics_batch_last(m, s, k, h)
    )(st, kin)
    scale = float(jnp.abs(ref.Mmat).max())
    np.testing.assert_allclose(
        np.transpose(np.asarray(M_bl), (2, 0, 1)), np.asarray(ref.Mmat),
        atol=2e-5 * scale,
    )
    bscale = float(jnp.abs(ref.bias).max()) + 1e-9
    np.testing.assert_allclose(
        np.asarray(bias), np.asarray(ref.bias), atol=2e-5 * bscale
    )
    np.testing.assert_allclose(np.asarray(Phi), np.asarray(ref.Phi), atol=1e-5)


@pytest.mark.parametrize("asset", ASSETS)
def test_fk_batched_matches_reference(asset):
    """Component-form batched FK == vmapped tree-walk FK on random states
    (engine default vs ASE_TPU_FK_AOS=1)."""
    m = mjcf.load_mjcf(asset)
    B = 12
    st = engine.batch_default_state(m, B)
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(11), 5)
    st = st._replace(
        root_pos=jax.random.normal(k1, (B, 3)),
        root_quat=rot.quat_unit(jax.random.normal(k2, (B, 4))),
        joint_q=rot.quat_unit(jax.random.normal(k3, st.joint_q.shape)),
        hinge_q=0.7 * jax.random.normal(k4, st.hinge_q.shape),
        u=st.u.at[:, : m.nv].set(jax.random.normal(k5, (B, m.nv))),
    )
    ref = jax.vmap(lambda s: dynamics.fk(m, s))(st)
    out = jax.jit(lambda s: dynamics2.fk_batched(m, s))(st)
    np.testing.assert_allclose(np.asarray(out.body_quat),
                               np.asarray(ref.body_quat), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.body_pos),
                               np.asarray(ref.body_pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.body_R),
                               np.asarray(ref.body_R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.body_vel),
                               np.asarray(ref.body_vel), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.com_world),
                               np.asarray(ref.com_world), atol=1e-5)
