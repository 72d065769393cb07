"""Pallas TPU kernel: fused projected-Jacobi contact iteration.

The contact impulse solve runs `iterations` rounds of
    r  = v0 + A λ
    dλ = Dinv · (target − r)          (3x3 block preconditioner)
    λ  = project_coulomb(λ + ω·dλ)
per environment. In plain XLA each round is an HBM round-trip of λ/r plus
kernel boundaries; this kernel keeps A (3K×3K) and all per-contact vectors
resident in VMEM for the whole iteration, one grid step per env tile.

Mosaic-friendly formulation: everything stays 2D (T, 3K). The block
preconditioner is a prebuilt block-diagonal (3K,3K) matrix, and the Coulomb
projection uses two static (3K,3K) selector matrices:
  * ``n_sel``  — broadcasts each block's normal impulse to its 3 lanes;
  * ``b_sum``  — sums tangent-squared magnitudes within each block.
Falls back transparently to the jnp implementation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas TPU backend
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_ENV_TILE = 8  # envs per grid step


@functools.lru_cache(maxsize=8)
def _static_masks(K: int):
    n = 3 * K
    block = np.arange(n) // 3
    comp = np.arange(n) % 3
    mask_n = (comp == 0).astype(np.float32)               # (n,)
    mask_t = 1.0 - mask_n
    # n_sel[j, i] = 1 iff j is the normal lane of i's block
    n_sel = np.zeros((n, n), np.float32)
    n_sel[3 * block[np.arange(n)], np.arange(n)] = 1.0
    # b_sum[j, i] = 1 iff same block (for summing tangent magnitudes)
    b_sum = (block[:, None] == block[None, :]).astype(np.float32)
    return mask_n, mask_t, n_sel, b_sum


def _kernel(A_ref, v0_ref, tgt_ref, dinv_ref, mu_ref, act_ref,
            mask_n_ref, mask_t_ref, n_sel_ref, b_sum_ref, lam_ref,
            iterations: int, omega: float):
    def dot(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # A/dinv are per-env (T, n, n); expand the dot over the tile dim
    A = A_ref[:]
    dinv = dinv_ref[:]

    def dot_b(x, M):
        return jax.lax.dot_general(
            M, x[..., None],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[..., 0]

    mask_n = mask_n_ref[:]
    mask_t = mask_t_ref[:]
    n_sel = n_sel_ref[:]
    b_sum = b_sum_ref[:]
    v0 = v0_ref[:]
    tgt = tgt_ref[:]
    mu_b = mu_ref[:]
    act_b = act_ref[:]

    def body(_, lam):
        r = v0 + dot_b(lam, A)
        dlam = dot_b(tgt - r, dinv)
        lam = lam + omega * dlam
        lam_n = jnp.maximum(lam, 0.0) * mask_n + lam * mask_t
        ln_b = dot(lam_n * mask_n, n_sel)
        ltsq = dot(jnp.square(lam_n) * mask_t, b_sum)
        lt_norm = jnp.sqrt(ltsq) + 1e-9
        scale = jnp.minimum(1.0, mu_b * ln_b / lt_norm)
        return (lam_n * mask_n + lam_n * mask_t * scale) * act_b

    lam_ref[:] = jax.lax.fori_loop(0, iterations, body, jnp.zeros_like(v0))


def _block_diag(dinv):
    """(B, K, 3, 3) -> (B, 3K, 3K) block diagonal."""
    B, K = dinv.shape[0], dinv.shape[1]
    eye = jnp.eye(K)
    # out[b, 3k+i, 3k+j] = dinv[b, k, i, j]
    out = jnp.einsum("bkij,kl->bkilj", dinv, eye)  # (B, K, 3, K, 3)
    return out.reshape(B, 3 * K, 3 * K)


def _prep(v0, target, diag_inv, mu, active):
    B, K = mu.shape
    masks = _static_masks(K)
    dinv_bd = _block_diag(diag_inv)
    mu_b = jnp.repeat(mu, 3, axis=-1)
    act_b = jnp.repeat(active, 3, axis=-1)
    return masks, dinv_bd, v0.reshape(B, 3 * K), target.reshape(B, 3 * K), mu_b, act_b


def solve_jacobi_pallas(A, v0, target, diag_inv, mu, active, iterations, omega):
    """Fused Jacobi solve. A (B,3K,3K), v0/target (B,K,3),
    diag_inv (B,K,3,3), mu/active (B,K). Returns λ (B,K,3)."""
    B, K = mu.shape
    masks, dinv_bd, v0f, tgtf, mu_b, act_b = _prep(v0, target, diag_inv, mu, active)

    T = _ENV_TILE
    pad = (-B) % T

    def padb(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

    A_, dinv_, v0_, tgt_, mu_, act_ = map(padb, (A, dinv_bd, v0f, tgtf, mu_b, act_b))
    Bp = B + pad
    n = 3 * K

    mask_n, mask_t, n_sel, b_sum = (jnp.asarray(m) for m in masks)
    kern = functools.partial(_kernel, iterations=iterations, omega=omega)
    lam = pl.pallas_call(
        kern,
        grid=(Bp // T,),
        in_specs=[
            pl.BlockSpec((T, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, n), lambda i: (i, 0)),
            pl.BlockSpec((T, n), lambda i: (i, 0)),
            pl.BlockSpec((T, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, n), lambda i: (i, 0)),
            pl.BlockSpec((T, n), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((n, n), lambda i: (0, 0)),
            pl.BlockSpec((n, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((T, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
    )(A_, v0_, tgt_, dinv_, mu_, act_,
      mask_n[None], mask_t[None], n_sel, b_sum)
    return lam[:B].reshape(B, K, 3)


def solve_jacobi_xla(A, v0, target, diag_inv, mu, active, iterations, omega):
    """jnp implementation of the same 2D formulation (CPU / fallback)."""
    B, K = mu.shape
    masks, dinv_bd, v0f, tgtf, mu_b, act_b = _prep(v0, target, diag_inv, mu, active)
    masks = tuple(jnp.asarray(m) for m in masks)
    mask_n, mask_t, n_sel, b_sum = masks
    hp = jax.lax.Precision.HIGHEST

    def body(_, lam):
        r = v0f + jnp.einsum("bij,bj->bi", A, lam, precision=hp)
        dlam = jnp.einsum("bij,bj->bi", dinv_bd, tgtf - r, precision=hp)
        lam = lam + omega * dlam
        lam_n = jnp.maximum(lam, 0.0) * mask_n + lam * mask_t
        ln_b = jnp.einsum("bj,ji->bi", lam_n * mask_n, n_sel, precision=hp)
        ltsq = jnp.einsum("bj,ji->bi", jnp.square(lam_n) * mask_t, b_sum, precision=hp)
        lt_norm = jnp.sqrt(ltsq) + 1e-9
        scale = jnp.minimum(1.0, mu_b * ln_b / lt_norm)
        return (lam_n * mask_n + lam_n * mask_t * scale) * act_b

    lam = jax.lax.fori_loop(0, iterations, body, jnp.zeros_like(v0f))
    return lam.reshape(B, K, 3)


def solve_jacobi(A, v0, target, diag_inv, mu, active, iterations, omega):
    """Dispatch to the Pallas kernel on TPU, jnp elsewhere."""
    import os

    if (_HAS_PALLAS and jax.default_backend() == "tpu"
            and os.environ.get("ASE_TPU_DISABLE_PALLAS", "0") != "1"):
        return solve_jacobi_pallas(
            A, v0, target, diag_inv, mu, active, iterations, omega
        )
    return solve_jacobi_xla(A, v0, target, diag_inv, mu, active, iterations, omega)
