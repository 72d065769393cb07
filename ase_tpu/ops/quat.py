"""Quaternion / rotation kernels (pure JAX, jit/vmap-safe).

Convention: quaternions are laid out ``(x, y, z, w)`` on the last axis, matching
the reference data format (poselib xyzw; see reference
``ase/poselib/poselib/core/rotation3d.py`` and ``ase/utils/torch_utils.py`` for
the behavioral spec these functions reproduce). All functions broadcast over
arbitrary leading batch dimensions and are total (guarded against NaN at the
singular points so they are safe under ``jax.grad``).

These are *semantic* re-implementations on JAX primitives, not translations:
everything is written so XLA can fuse the elementwise pipelines into
surrounding compute (obs kernels, motion blending, FK).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


# ---------------------------------------------------------------------------
# basic algebra
# ---------------------------------------------------------------------------

def quat_identity(shape=()) -> jnp.ndarray:
    """Identity quaternion(s) with the given leading shape."""
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 3].set(1.0)


def quat_unit(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to a unit quaternion (safe at zero)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, _EPS)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., 0:3], q[..., 3:4]], axis=-1)


# Alias: for unit quaternions the inverse is the conjugate.
quat_inverse = quat_conjugate


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b in xyzw layout (spec: reference rotation3d.quat_mul)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = aw * bx + ax * bw + ay * bz - az * by
    y = aw * by + ay * bw + az * bx - ax * bz
    z = aw * bz + az * bw + ax * by - ay * bx
    w = aw * bw - ax * bx - ay * by - az * bz
    return jnp.stack([x, y, z, w], axis=-1)


def quat_mul_norm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return quat_unit(quat_mul(a, b))


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: v' = q v q⁻¹."""
    qvec = q[..., 0:3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + w * t + jnp.cross(qvec, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conjugate(q), v)


def quat_abs_positive(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so w >= 0 (canonical hemisphere)."""
    s = jnp.where(q[..., 3:4] < 0.0, -1.0, 1.0)
    return q * s


# ---------------------------------------------------------------------------
# angle-axis / exponential map
# ---------------------------------------------------------------------------

def normalize_angle(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def quat_from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """axis must be unit length; angle broadcasts against axis[..., 3]."""
    half = 0.5 * angle
    s = jnp.sin(half)
    xyz = axis * s[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([xyz, w], axis=-1)


def quat_to_angle_axis(q: jnp.ndarray):
    """Inverse of quat_from_angle_axis; spec: reference torch_utils.quat_to_angle_axis.

    Returns (angle, axis); angle is wrapped to (-pi, pi], axis defaults to +z
    near identity.
    """
    min_theta = 1e-5
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    angle = normalize_angle(2.0 * jnp.arccos(w))
    safe_sin = jnp.where(sin_theta > min_theta, sin_theta, 1.0)
    axis = q[..., 0:3] / safe_sin[..., None]

    mask = sin_theta > min_theta
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    angle = jnp.where(mask, angle, jnp.zeros_like(angle))
    axis = jnp.where(mask[..., None], axis, default_axis)
    return angle, axis


def angle_axis_to_exp_map(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    return angle[..., None] * axis


def quat_to_exp_map(q: jnp.ndarray) -> jnp.ndarray:
    angle, axis = quat_to_angle_axis(q)
    return angle_axis_to_exp_map(angle, axis)


def exp_map_to_angle_axis(exp_map: jnp.ndarray):
    min_theta = 1e-5
    sq = jnp.sum(exp_map * exp_map, axis=-1)
    angle = jnp.sqrt(jnp.maximum(sq, _EPS))
    safe_angle = jnp.where(angle > min_theta, angle, 1.0)
    axis = exp_map / safe_angle[..., None]
    wrapped = normalize_angle(angle)

    mask = angle > min_theta
    default_axis = jnp.zeros_like(exp_map).at[..., 2].set(1.0)
    out_angle = jnp.where(mask, wrapped, jnp.zeros_like(wrapped))
    out_axis = jnp.where(mask[..., None], axis, default_axis)
    return out_angle, out_axis


def exp_map_to_quat(exp_map: jnp.ndarray) -> jnp.ndarray:
    angle, axis = exp_map_to_angle_axis(exp_map)
    return quat_from_angle_axis(angle, axis)


# ---------------------------------------------------------------------------
# 6D tangent-normal representation (spec: torch_utils.quat_to_tan_norm)
# ---------------------------------------------------------------------------

def quat_to_tan_norm(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation as concatenated rotated x-axis (tangent) and z-axis (normal)."""
    ref_tan = jnp.zeros_like(q[..., 0:3]).at[..., 0].set(1.0)
    ref_norm = jnp.zeros_like(q[..., 0:3]).at[..., 2].set(1.0)
    tan = quat_rotate(q, ref_tan)
    norm = quat_rotate(q, ref_norm)
    return jnp.concatenate([tan, norm], axis=-1)


# ---------------------------------------------------------------------------
# euler helpers
# ---------------------------------------------------------------------------

def quat_from_euler_xyz(roll, pitch, yaw) -> jnp.ndarray:
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


# ---------------------------------------------------------------------------
# rotation matrices
# ---------------------------------------------------------------------------

def quat_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(…,4) -> (…,3,3); column-vector convention R @ v == quat_rotate(q, v)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_rotation_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """(…,3,3) -> (…,4) xyzw. Branch-free Shepperd-style construction."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by max pivot.
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) / 2.0

    c0 = jnp.stack([
        (m21 - m12) / (4.0 * qw), (m02 - m20) / (4.0 * qw),
        (m10 - m01) / (4.0 * qw), qw], axis=-1)
    c1 = jnp.stack([
        qx, (m01 + m10) / (4.0 * qx),
        (m02 + m20) / (4.0 * qx), (m21 - m12) / (4.0 * qx)], axis=-1)
    c2 = jnp.stack([
        (m01 + m10) / (4.0 * qy), qy,
        (m12 + m21) / (4.0 * qy), (m02 - m20) / (4.0 * qy)], axis=-1)
    c3 = jnp.stack([
        (m02 + m20) / (4.0 * qz), (m12 + m21) / (4.0 * qz),
        qz, (m10 - m01) / (4.0 * qz)], axis=-1)

    pivots = jnp.stack([qw, qx, qy, qz], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)
    return quat_unit(q[..., 0, :])


# ---------------------------------------------------------------------------
# slerp (spec: torch_utils.slerp, incl. the small-angle / aligned fallbacks)
# ---------------------------------------------------------------------------

def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation; t broadcasts with trailing dim 1 on the quat axis."""
    cos_half = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(cos_half[..., None] < 0.0, -q1, q1)
    cos_half = jnp.abs(cos_half)[..., None]
    cos_half_c = jnp.clip(cos_half, 0.0, 1.0)

    half_theta = jnp.arccos(cos_half_c)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half_c * cos_half_c, 0.0))
    safe_sin = jnp.where(jnp.abs(sin_half) < 1e-3, 1.0, sin_half)

    ratio_a = jnp.sin((1.0 - t) * half_theta) / safe_sin
    ratio_b = jnp.sin(t * half_theta) / safe_sin
    out = ratio_a * q0 + ratio_b * q1

    out = jnp.where(jnp.abs(sin_half) < 1e-3, 0.5 * q0 + 0.5 * q1, out)
    out = jnp.where(cos_half >= 1.0, q0, out)
    return out


# ---------------------------------------------------------------------------
# heading-frame helpers (spec: torch_utils.calc_heading*)
# ---------------------------------------------------------------------------

def calc_heading(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw of the rotated x-axis projected on the xy-plane."""
    ref_dir = jnp.zeros_like(q[..., 0:3]).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def _heading_quat(q: jnp.ndarray, sign: float) -> jnp.ndarray:
    heading = sign * calc_heading(q)
    axis = jnp.zeros_like(q[..., 0:3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(heading, axis)


def calc_heading_quat(q: jnp.ndarray) -> jnp.ndarray:
    return _heading_quat(q, 1.0)


def calc_heading_quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    return _heading_quat(q, -1.0)


# ---------------------------------------------------------------------------
# quaternion calculus (used by physics integration)
# ---------------------------------------------------------------------------

def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by angular velocity omega (world frame, rad/s).

    Uses the exact exponential-map update q' = exp(dt*omega/2) ⊗ q, which is
    stable for large steps (unlike the linearized qdot update).
    """
    dq = exp_map_to_quat(omega * dt)
    return quat_unit(quat_mul(dq, q))


def quat_integrate_local(q: jnp.ndarray, omega_local: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate by angular velocity expressed in the child (local) frame."""
    dq = exp_map_to_quat(omega_local * dt)
    return quat_unit(quat_mul(q, dq))


def quat_diff_rad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle of the relative rotation between two quaternions."""
    d = quat_mul(a, quat_conjugate(b))
    w = jnp.clip(jnp.abs(d[..., 3]), 0.0, 1.0)
    return 2.0 * jnp.arccos(w)
