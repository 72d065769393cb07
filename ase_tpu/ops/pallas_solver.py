"""Pallas TPU kernel: fused projected-Jacobi contact iteration.

The contact impulse solve runs `iterations` rounds of
    r     = v0 + (A @ λ)
    dλ    = Dinv · (target − r)
    λ     = project_coulomb(λ + ω·dλ)
per environment. In plain XLA each round is a separate HBM round-trip of λ/r
plus kernel boundaries; this kernel keeps A (3K×3K), λ and all per-contact
vectors resident in VMEM for the whole iteration, one grid step per env tile.

Falls back transparently to the jnp implementation when Pallas is unavailable
(e.g. CPU test mesh) — see ``solve_jacobi``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # Pallas TPU backend
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_ENV_TILE = 8  # envs per grid step


def _kernel(A_ref, v0_ref, tgt_ref, dinv_ref, mu_ref, active_ref, lam_ref,
            *, iterations: int, omega: float, K: int):
    A = A_ref[:]            # (T, 3K, 3K)
    v0 = v0_ref[:]          # (T, 3K)
    tgt = tgt_ref[:]        # (T, 3K)
    dinv = dinv_ref[:]      # (T, K, 3, 3)
    mu = mu_ref[:]          # (T, K)
    active = active_ref[:]  # (T, K)

    T = A.shape[0]

    def body(_, lam):
        r = v0 + jax.lax.dot_general(
            A, lam[..., None],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[..., 0]
        err = (tgt - r).reshape(T, K, 3)
        dlam = jnp.einsum(
            "tkij,tkj->tki", dinv, err, preferred_element_type=jnp.float32
        )
        lam3 = lam.reshape(T, K, 3) + omega * dlam
        ln = jnp.maximum(lam3[..., 0], 0.0)
        lt = lam3[..., 1:3]
        lt_norm = jnp.sqrt(jnp.sum(lt * lt, axis=-1)) + 1e-9
        scale = jnp.minimum(1.0, mu * ln / lt_norm)
        lam3 = jnp.concatenate([ln[..., None], lt * scale[..., None]], axis=-1)
        lam3 = lam3 * active[..., None]
        return lam3.reshape(T, 3 * K)

    lam = jax.lax.fori_loop(0, iterations, body, jnp.zeros((T, 3 * K)))
    lam_ref[:] = lam


def solve_jacobi_pallas(A, v0, target, diag_inv, mu, active, iterations, omega):
    """Batched fused Jacobi solve.

    A (B,3K,3K), v0/target (B,K,3), diag_inv (B,K,3,3), mu/active (B,K).
    Returns λ (B,K,3).
    """
    B, K = mu.shape
    T = _ENV_TILE
    pad = (-B) % T
    if pad:
        A = jnp.pad(A, ((0, pad), (0, 0), (0, 0)))
        v0 = jnp.pad(v0, ((0, pad), (0, 0), (0, 0)))
        target = jnp.pad(target, ((0, pad), (0, 0), (0, 0)))
        diag_inv = jnp.pad(diag_inv, ((0, pad), (0, 0), (0, 0), (0, 0)))
        mu = jnp.pad(mu, ((0, pad), (0, 0)))
        active = jnp.pad(active, ((0, pad), (0, 0)))
    Bp = B + pad

    kern = functools.partial(_kernel, iterations=iterations, omega=omega, K=K)
    lam = pl.pallas_call(
        kern,
        grid=(Bp // T,),
        in_specs=[
            pl.BlockSpec((T, 3 * K, 3 * K), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, 3 * K), lambda i: (i, 0)),
            pl.BlockSpec((T, 3 * K), lambda i: (i, 0)),
            pl.BlockSpec((T, K, 3, 3), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((T, K), lambda i: (i, 0)),
            pl.BlockSpec((T, K), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((T, 3 * K), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, 3 * K), jnp.float32),
    )(A, v0.reshape(Bp, 3 * K), target.reshape(Bp, 3 * K), diag_inv, mu, active)
    return lam[:B].reshape(B, K, 3)


def solve_jacobi_xla(A, v0, target, diag_inv, mu, active, iterations, omega):
    """Reference jnp implementation (used on CPU and as fallback)."""
    B, K = mu.shape

    def it(_, lam):
        r = v0.reshape(B, -1) + jnp.einsum(
            "bij,bj->bi", A, lam.reshape(B, -1),
            precision=jax.lax.Precision.HIGHEST,
        )
        err = (target.reshape(B, -1) - r).reshape(B, K, 3)
        dlam = jnp.einsum("bkij,bkj->bki", diag_inv, err,
                          precision=jax.lax.Precision.HIGHEST)
        lam3 = lam + omega * dlam
        ln = jnp.maximum(lam3[..., 0], 0.0)
        lt = lam3[..., 1:3]
        lt_norm = jnp.linalg.norm(lt, axis=-1) + 1e-9
        scale = jnp.minimum(1.0, mu * ln / lt_norm)
        lam3 = jnp.concatenate([ln[..., None], lt * scale[..., None]], axis=-1)
        return lam3 * active[..., None]

    return jax.lax.fori_loop(0, iterations, it, jnp.zeros((B, K, 3)))


def solve_jacobi(A, v0, target, diag_inv, mu, active, iterations, omega):
    """Dispatch to the Pallas kernel on TPU, jnp elsewhere."""
    if _HAS_PALLAS and jax.default_backend() == "tpu":
        try:
            return solve_jacobi_pallas(
                A, v0, target, diag_inv, mu, active, iterations, omega
            )
        except Exception:
            pass
    return solve_jacobi_xla(A, v0, target, diag_inv, mu, active, iterations, omega)
