"""6D spatial-vector algebra (Featherstone RBDA conventions) in pure JAX.

Spatial motion/force vectors are arrays with trailing dim 6 laid out as
``[angular(3), linear(3)]``. All functions broadcast over leading batch dims.

Frames: a spatial transform from frame A to frame B is parameterized by
``E`` (3x3 rotation taking A-coordinates to B-coordinates) and ``r`` (origin of
B expressed in A coordinates). This matches RBDA's ``plx(E, r)``.

The articulated dynamics built on these ops (see ``ase_tpu/physics``) replaces
the reference's closed-source PhysX backend (reference ``isaacgym`` calls in
``ase/env/tasks/base_task.py:403-407``); nothing here is a translation — it is
the standard textbook algebra arranged as batched 3x3/6x6 einsums so XLA maps
it to the TPU MXU/VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial

# Physics algebra needs true fp32 contractions: the platform default matmul
# precision may be bf16-class, which is catastrophic for 3x3/6x6 dynamics math.
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(…,3) -> (…,3,3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def motion_cross(v: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """v ×m w for spatial motion vectors."""
    vw, vl = v[..., 0:3], v[..., 3:6]
    ww, wl = w[..., 0:3], w[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(vw, ww), jnp.cross(vw, wl) + jnp.cross(vl, ww)], axis=-1
    )


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """v ×f f for spatial force vectors (dual of motion_cross)."""
    vw, vl = v[..., 0:3], v[..., 3:6]
    fw, fl = f[..., 0:3], f[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(vw, fw) + jnp.cross(vl, fl), jnp.cross(vw, fl)], axis=-1
    )


def xform(E: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Motion transform X (…,6,6) from (E, r): v_B = X @ v_A."""
    Erx = _einsum("...ij,...jk->...ik", E, skew(r))
    top = jnp.concatenate([E, jnp.zeros_like(E)], axis=-1)
    bot = jnp.concatenate([-Erx, E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def xform_motion(E: jnp.ndarray, r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply motion transform without materializing the 6x6."""
    w, l = v[..., 0:3], v[..., 3:6]
    Ew = _einsum("...ij,...j->...i", E, w)
    El = _einsum("...ij,...j->...i", E, l - jnp.cross(r, w))
    return jnp.concatenate([Ew, El], axis=-1)


def xform_motion_inv(E: jnp.ndarray, r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Inverse motion transform: v_A = X^{-1} @ v_B."""
    w, l = v[..., 0:3], v[..., 3:6]
    Etw = _einsum("...ji,...j->...i", E, w)
    Etl = _einsum("...ji,...j->...i", E, l)
    return jnp.concatenate([Etw, Etl + jnp.cross(r, Etw)], axis=-1)


def xform_force_to_parent(E: jnp.ndarray, r: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """f_A = X^T @ f_B — transform a force from the child frame back to parent."""
    n, l = f[..., 0:3], f[..., 3:6]
    Etl = _einsum("...ji,...j->...i", E, l)
    Etn = _einsum("...ji,...j->...i", E, n)
    return jnp.concatenate([Etn + jnp.cross(r, Etl), Etl], axis=-1)


def spatial_inertia(mass: jnp.ndarray, com: jnp.ndarray, inertia_com: jnp.ndarray) -> jnp.ndarray:
    """Spatial inertia (…,6,6) at the body frame origin.

    mass (…,), com (…,3) offset of center of mass from frame origin,
    inertia_com (…,3,3) rotational inertia about the COM in body axes.
    """
    cx = skew(com)
    m = mass[..., None, None]
    I_top_left = inertia_com + m * _einsum("...ij,...kj->...ik", cx, cx)
    top = jnp.concatenate([I_top_left, m * cx], axis=-1)
    bot = jnp.concatenate([-m * cx, m * jnp.broadcast_to(jnp.eye(3), cx.shape)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
