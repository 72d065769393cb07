"""Parity tests pinning the TPU-layout (SoA) kernels to their reference
implementations: collision3.detect_batched vs vmapped collision2.detect,
the batch-last Cholesky vs lax.linalg.cholesky, and the component-grouped
Jacobi solver vs the block formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.ops import linalg3
from ase_tpu.ops import jacobi_solver as ps
from ase_tpu.ops import quat as rot
from ase_tpu.physics import collision2, collision3, dynamics, engine, mjcf

import os as _os
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

ASSET = _REPO + "/data/assets/mjcf/amp_humanoid_sword_shield.xml"


def _random_states(m, B, seed=3):
    st = engine.batch_default_state(m, B)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return st._replace(
        root_pos=st.root_pos.at[:, 2].set(0.5 + jax.random.uniform(k1, (B,))),
        root_quat=rot.quat_unit(jax.random.normal(k2, (B, 4))),
        joint_q=rot.quat_unit(jax.random.normal(k3, st.joint_q.shape)),
    )


def test_collision_soa_matches_aos():
    m = mjcf.load_mjcf(ASSET)
    tables = collision2.build_tables(m, True)
    B = 16
    st = _random_states(m, B)
    kin = jax.vmap(lambda s: dynamics.fk(m, s))(st)
    prop_R = rot.quat_to_rotation_matrix(st.prop_quat)
    aos = jax.vmap(
        lambda bR, bp, pR, pp: collision2.detect(m, tables, bR, bp, pR, pp, 24)
    )(kin.body_R, kin.body_pos, prop_R, st.prop_pos)
    soa = jax.jit(
        lambda kin, st: collision3.detect_batched(
            m, tables.soa, kin.body_quat, kin.body_pos, st.prop_quat,
            st.prop_pos, 24,
        )
    )(kin, st)
    for b in range(B):
        np.testing.assert_allclose(
            np.sort(np.asarray(aos.depth[b])),
            np.sort(np.asarray(soa.depth[b])),
            atol=2e-5,
        )
    # attributes must agree at matching depth ranks
    oa = np.argsort(-np.asarray(aos.depth), axis=1)
    os_ = np.argsort(-np.asarray(soa.depth), axis=1)
    for field in ("normal", "pos", "friction"):
        va, vs = np.asarray(getattr(aos, field)), np.asarray(getattr(soa, field))
        fa = np.take_along_axis(va, oa[..., None] if va.ndim == 3 else oa, axis=1)
        fs = np.take_along_axis(vs, os_[..., None] if vs.ndim == 3 else os_, axis=1)
        np.testing.assert_allclose(fa, fs, atol=1e-4, err_msg=field)


def test_batch_last_cholesky_matches_lax():
    m = mjcf.load_mjcf(ASSET)
    B = 128
    st = _random_states(m, B)
    kin = jax.vmap(lambda s: dynamics.fk(m, s))(st)
    h = 1.0 / 120.0
    dyn = jax.vmap(lambda a, b: dynamics.compute_dynamics(m, a, b, h))(st, kin)
    L_fast = jax.jit(engine._chol_batched)(dyn.Mmat)
    L_lax = jax.lax.linalg.cholesky(dyn.Mmat, symmetrize_input=False)
    np.testing.assert_allclose(
        np.asarray(L_fast), np.tril(np.asarray(L_lax)), atol=5e-5
    )


def test_solver_soa_matches_aos():
    B, K = 8, 24
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    Jr = jax.random.normal(ks[0], (B, 3 * K, 40))
    A = jnp.einsum("bik,bjk->bij", Jr, Jr) / 40 + 1e-6 * jnp.eye(3 * K)
    v0 = jax.random.normal(ks[1], (B, K, 3))
    target = jnp.concatenate(
        [jax.random.uniform(ks[2], (B, K, 1)), jnp.zeros((B, K, 2))], -1
    )
    ar = np.arange(K)
    diag = A.reshape(B, K, 3, K, 3)[:, ar, :, ar, :].transpose(1, 0, 2, 3)
    diag_inv = linalg3.inv3(diag + 1e-5 * jnp.eye(3))
    mu = jax.random.uniform(ks[3], (B, K))
    active = (jax.random.uniform(ks[4], (B, K)) > 0.3).astype(jnp.float32)
    cap = jnp.full((B, K), 10.0)
    a = ps.solve_jacobi_xla(A, v0, target, diag_inv, mu, active, 24, 0.35, cap)
    b = ps.solve_jacobi_xla_soa(A, v0, target, diag_inv, mu, active, 24, 0.35, cap)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
