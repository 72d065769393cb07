"""Closed-form small-matrix routines.

LAPACK-style ``jnp.linalg.inv/solve`` on tiny batched matrices is extremely
slow on TPU (LU pivoting serializes); 3x3 systems appearing in contact
solvers and rigid-body updates use the adjugate formula instead — pure
elementwise VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv3(m: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (…,3,3)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d

    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, jnp.where(det >= 0, eps, -eps))
    adj = jnp.stack(
        [A, D, G, B, E, H, C, F, I], axis=-1
    ).reshape(m.shape[:-2] + (3, 3))
    return adj * inv_det[..., None, None]


def solve3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Solve m @ x = v for 3x3 m (…,3,3) and v (…,3)."""
    return jnp.einsum("...ij,...j->...i", inv3(m), v)
