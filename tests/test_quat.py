import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ase_tpu.ops import quat as q
from ase_tpu.ops import spatial as sp


def rand_quat(key, shape=()):
    v = jax.random.normal(key, shape + (4,))
    return q.quat_unit(v)


def test_mul_identity():
    key = jax.random.PRNGKey(0)
    a = rand_quat(key, (32,))
    ident = q.quat_identity((32,))
    np.testing.assert_allclose(q.quat_mul(a, ident), a, atol=1e-6)
    np.testing.assert_allclose(q.quat_mul(ident, a), a, atol=1e-6)


def test_rotate_roundtrip():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    a = rand_quat(k1, (64,))
    v = jax.random.normal(k2, (64, 3))
    rotated = q.quat_rotate(a, v)
    back = q.quat_rotate(q.quat_conjugate(a), rotated)
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_rotate_matches_matrix():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    a = rand_quat(k1, (16,))
    v = jax.random.normal(k2, (16, 3))
    R = q.quat_to_rotation_matrix(a)
    np.testing.assert_allclose(
        jnp.einsum("bij,bj->bi", R, v), q.quat_rotate(a, v), atol=1e-5
    )


def test_matrix_roundtrip():
    key = jax.random.PRNGKey(3)
    a = rand_quat(key, (128,))
    R = q.quat_to_rotation_matrix(a)
    b = q.quat_from_rotation_matrix(R)
    # quaternion double cover: compare up to sign
    dot = jnp.abs(jnp.sum(a * b, axis=-1))
    np.testing.assert_allclose(dot, jnp.ones_like(dot), atol=1e-5)


def test_angle_axis_roundtrip():
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    angle = jax.random.uniform(k2, (64,), minval=-3.0, maxval=3.0)
    axis = jax.random.normal(k1, (64, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    qq = q.quat_from_angle_axis(angle, axis)
    a2, ax2 = q.quat_to_angle_axis(qq)
    np.testing.assert_allclose(a2 * ax2[..., 0], angle * axis[..., 0], atol=1e-4)
    np.testing.assert_allclose(a2 * ax2[..., 1], angle * axis[..., 1], atol=1e-4)


def test_exp_map_roundtrip():
    # roundtrip holds on the principal branch |em| < pi (larger angles wrap,
    # matching the reference's normalize_angle semantics)
    key = jax.random.PRNGKey(5)
    em = jax.random.normal(key, (64, 3))
    em = em / jnp.maximum(jnp.linalg.norm(em, axis=-1, keepdims=True) / 3.0, 1.0)
    qq = q.exp_map_to_quat(em)
    em2 = q.quat_to_exp_map(qq)
    np.testing.assert_allclose(em2, em, atol=1e-4)


def test_exp_map_identity_is_safe():
    em = jnp.zeros((4, 3))
    qq = q.exp_map_to_quat(em)
    np.testing.assert_allclose(qq, q.quat_identity((4,)), atol=1e-6)
    g = jax.grad(lambda e: jnp.sum(q.exp_map_to_quat(e)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_tan_norm_dims_and_orthonormal():
    key = jax.random.PRNGKey(6)
    a = rand_quat(key, (8,))
    tn = q.quat_to_tan_norm(a)
    assert tn.shape == (8, 6)
    tan, norm = tn[..., 0:3], tn[..., 3:6]
    np.testing.assert_allclose(jnp.sum(tan * norm, axis=-1), np.zeros(8), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.norm(tan, axis=-1), np.ones(8), atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    a = rand_quat(k1, (16,))
    b = rand_quat(k2, (16,))
    t0 = q.slerp(a, b, jnp.zeros((16, 1)))
    t1 = q.slerp(a, b, jnp.ones((16, 1)))
    dot0 = jnp.abs(jnp.sum(t0 * a, axis=-1))
    dot1 = jnp.abs(jnp.sum(t1 * b, axis=-1))
    np.testing.assert_allclose(dot0, np.ones(16), atol=1e-4)
    np.testing.assert_allclose(dot1, np.ones(16), atol=1e-4)
    # midpoint is equidistant
    tm = q.slerp(a, b, jnp.full((16, 1), 0.5))
    da = q.quat_diff_rad(tm, a)
    db = q.quat_diff_rad(tm, b)
    np.testing.assert_allclose(da, db, atol=1e-3)


def test_heading():
    # rotation purely about z by theta has heading theta
    theta = jnp.linspace(-3.0, 3.0, 13)
    axis = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (13, 1))
    qq = q.quat_from_angle_axis(theta, axis)
    np.testing.assert_allclose(q.calc_heading(qq), theta, atol=1e-5)
    hq_inv = q.calc_heading_quat_inv(qq)
    # applying inverse heading gives zero heading
    combined = q.quat_mul(hq_inv, qq)
    np.testing.assert_allclose(q.calc_heading(combined), np.zeros(13), atol=1e-5)


def test_quat_integrate_constant_omega():
    omega = jnp.array([0.0, 0.0, 1.0])
    qq = q.quat_identity(())
    dt = 0.01
    for _ in range(100):
        qq = q.quat_integrate(qq, omega, dt)
    angle, axis = q.quat_to_angle_axis(qq)
    np.testing.assert_allclose(float(angle), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(axis), [0, 0, 1], atol=1e-5)


# ---------------------------------------------------------------------------
# spatial algebra
# ---------------------------------------------------------------------------

def test_xform_roundtrip():
    key = jax.random.PRNGKey(8)
    k1, k2, k3 = jax.random.split(key, 3)
    E = q.quat_to_rotation_matrix(rand_quat(k1, (8,)))
    r = jax.random.normal(k2, (8, 3))
    v = jax.random.normal(k3, (8, 6))
    fwd = sp.xform_motion(E, r, v)
    back = sp.xform_motion_inv(E, r, fwd)
    np.testing.assert_allclose(back, v, atol=1e-5)
    # materialized matrix agrees
    X = sp.xform(E, r)
    applied = jnp.einsum("bij,bj->bi", X, v, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(applied, fwd, atol=1e-5)


def test_force_transform_is_dual():
    """Power invariance: f·v is frame independent."""
    key = jax.random.PRNGKey(9)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    E = q.quat_to_rotation_matrix(rand_quat(k1, (8,)))
    r = jax.random.normal(k2, (8, 3))
    vA = jax.random.normal(k3, (8, 6))
    fB = jax.random.normal(k4, (8, 6))
    vB = sp.xform_motion(E, r, vA)
    fA = sp.xform_force_to_parent(E, r, fB)
    np.testing.assert_allclose(
        jnp.sum(fA * vA, axis=-1), jnp.sum(fB * vB, axis=-1), atol=1e-4
    )


def test_spatial_inertia_point_mass():
    m = jnp.array([2.0])
    com = jnp.array([[0.3, -0.2, 0.5]])
    I = sp.spatial_inertia(m, com, jnp.zeros((1, 3, 3)))
    # kinetic energy of pure translation: 0.5 v^T I v = 0.5 m |v|^2
    v = jnp.array([[0.0, 0.0, 0.0, 1.0, 2.0, -1.0]])
    hp = jax.lax.Precision.HIGHEST
    ke = 0.5 * jnp.einsum("bi,bij,bj->b", v, I, v, precision=hp)
    np.testing.assert_allclose(float(ke[0]), 0.5 * 2.0 * 6.0, atol=1e-4)
    # rotation about an axis through the COM sees zero inertia for a point mass
    w = jnp.array([1.0, 0.0, 0.0])
    vrot = jnp.concatenate([w, jnp.cross(com[0], w) * -1.0])[None]
    # velocity of com = w x (com) relative... point mass spinning about com axis:
    # v_origin = w x (0 - com) = -w x com = cross(com, w)
    vrot = jnp.concatenate([w, jnp.cross(w, -com[0])])[None]
    ke = 0.5 * jnp.einsum("bi,bij,bj->b", vrot, I, vrot, precision=hp)
    np.testing.assert_allclose(float(ke[0]), 0.0, atol=1e-4)


def test_motion_cross_identities():
    key = jax.random.PRNGKey(10)
    k1, k2 = jax.random.split(key)
    v = jax.random.normal(k1, (8, 6))
    f = jax.random.normal(k2, (8, 6))
    # v xm v = 0
    np.testing.assert_allclose(sp.motion_cross(v, v), np.zeros((8, 6)), atol=1e-6)
    # duality: (v xm w) . f = -w . (v xf f)
    w = jax.random.normal(jax.random.PRNGKey(11), (8, 6))
    lhs = jnp.sum(sp.motion_cross(v, w) * f, axis=-1)
    rhs = -jnp.sum(w * sp.force_cross(v, f), axis=-1)
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
