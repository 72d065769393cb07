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
