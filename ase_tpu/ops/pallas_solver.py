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
    # P_j[src, dst] = 1 iff src = 3*block(dst) + j  (lane shuffle matmuls for
    # the 3x3 block apply without materializing a block-diagonal matrix)
    perms = []
    for j in range(3):
        P = np.zeros((n, n), np.float32)
        P[3 * block + j, np.arange(n)] = 1.0
        perms.append(P)
    return mask_n, mask_t, n_sel, b_sum, perms[0], perms[1], perms[2]


def _kernel(A_ref, v0_ref, tgt_ref, c0_ref, c1_ref, c2_ref, mu_ref, act_ref,
            mask_n_ref, mask_t_ref, n_sel_ref, b_sum_ref, p0_ref, p1_ref,
            p2_ref, lam_ref, iterations: int, omega: float):
    def dot(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    A = A_ref[:]

    def dot_b(x, M):
        # per-env matvec: (T, n, n) @ (T, n)
        return jax.lax.dot_general(
            M, x[..., None],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[..., 0]

    mask_n = mask_n_ref[:]
    mask_t = mask_t_ref[:]
    n_sel = n_sel_ref[:]
    b_sum = b_sum_ref[:]
    P0, P1, P2 = p0_ref[:], p1_ref[:], p2_ref[:]
    C0, C1, C2 = c0_ref[:], c1_ref[:], c2_ref[:]
    v0 = v0_ref[:]
    tgt = tgt_ref[:]
    mu_b = mu_ref[:]
    act_b = act_ref[:]

    def body(_, lam):
        r = v0 + dot_b(lam, A)
        err = tgt - r
        # 3x3 block preconditioner via lane shuffles (no block-diag matrix)
        dlam = C0 * dot(err, P0) + C1 * dot(err, P1) + C2 * dot(err, P2)
        lam = lam + omega * dlam
        lam_n = jnp.maximum(lam, 0.0) * mask_n + lam * mask_t
        ln_b = dot(lam_n * mask_n, n_sel)
        ltsq = dot(jnp.square(lam_n) * mask_t, b_sum)
        lt_norm = jnp.sqrt(ltsq) + 1e-9
        scale = jnp.minimum(1.0, mu_b * ln_b / lt_norm)
        return (lam_n * mask_n + lam_n * mask_t * scale) * act_b

    lam_ref[:] = jax.lax.fori_loop(0, iterations, body, jnp.zeros_like(v0))


def _prep(v0, target, diag_inv, mu, active):
    """Flatten to 2D and extract the block coefficients C_j[i]=dinv[b(i),i%3,j]."""
    B, K = mu.shape
    masks = _static_masks(K)
    # (B,K,3,3) -> (B, 3K) per source column j
    Cs = tuple(diag_inv[..., j].reshape(B, 3 * K) for j in range(3))
    mu_b = jnp.repeat(mu, 3, axis=-1)
    act_b = jnp.repeat(active, 3, axis=-1)
    return masks, Cs, v0.reshape(B, 3 * K), target.reshape(B, 3 * K), mu_b, act_b


def solve_jacobi_pallas(A, v0, target, diag_inv, mu, active, iterations, omega):
    """Fused Jacobi solve. A (B,3K,3K), v0/target (B,K,3),
    diag_inv (B,K,3,3), mu/active (B,K). Returns λ (B,K,3)."""
    B, K = mu.shape
    masks, Cs, v0f, tgtf, mu_b, act_b = _prep(v0, target, diag_inv, mu, active)

    T = _ENV_TILE
    pad = (-B) % T

    def padb(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

    A_, v0_, tgt_, mu_, act_ = map(padb, (A, v0f, tgtf, mu_b, act_b))
    C0, C1, C2 = map(padb, Cs)
    Bp = B + pad
    n = 3 * K

    mask_n, mask_t, n_sel, b_sum, P0, P1, P2 = (jnp.asarray(m) for m in masks)
    kern = functools.partial(_kernel, iterations=iterations, omega=omega)
    env_spec = pl.BlockSpec((T, n), lambda i: (i, 0))
    const_vec = pl.BlockSpec((1, n), lambda i: (0, 0))
    const_mat = pl.BlockSpec((n, n), lambda i: (0, 0))
    lam = pl.pallas_call(
        kern,
        grid=(Bp // T,),
        in_specs=[
            pl.BlockSpec((T, n, n), lambda i: (i, 0, 0)),
            env_spec, env_spec, env_spec, env_spec, env_spec,
            env_spec, env_spec,
            const_vec, const_vec, const_mat, const_mat,
            const_mat, const_mat, const_mat,
        ],
        out_specs=env_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
    )(A_, v0_, tgt_, C0, C1, C2, mu_, act_,
      mask_n[None], mask_t[None], n_sel, b_sum, P0, P1, P2)
    return lam[:B].reshape(B, K, 3)


def solve_jacobi_xla(A, v0, target, diag_inv, mu, active, iterations, omega,
                     lam_cap=None):
    """jnp implementation (CPU / fallback): direct (B,K,3) block math.

    If A arrives as bfloat16 the iteration matvec runs bf16 x bf16 -> f32
    (halves the dominant HBM traffic: A is re-read every iteration); the
    block preconditioner, projection, and accumulation stay f32."""
    B, K = mu.shape
    hp = jax.lax.Precision.HIGHEST
    mv_kw = (
        dict(preferred_element_type=jnp.float32)
        if A.dtype == jnp.bfloat16
        else dict(precision=hp)
    )

    def body(_, lam):
        r = v0 + jnp.einsum(
            "bij,bj->bi", A, lam.reshape(B, -1).astype(A.dtype), **mv_kw
        ).astype(jnp.float32).reshape(B, K, 3)
        dlam = jnp.einsum("bkij,bkj->bki", diag_inv, target - r, precision=hp)
        lam3 = lam + omega * dlam
        ln = jnp.maximum(lam3[..., 0], 0.0)
        if lam_cap is not None:
            ln = jnp.minimum(ln, lam_cap)
        lt = lam3[..., 1:3]
        lt_norm = jnp.linalg.norm(lt, axis=-1) + 1e-9
        scale = jnp.minimum(1.0, mu * ln / lt_norm)
        lam3 = jnp.concatenate([ln[..., None], lt * scale[..., None]], axis=-1)
        return lam3 * active[..., None]

    return jax.lax.fori_loop(0, iterations, body, jnp.zeros((B, K, 3)))


def solve_jacobi_xla_soa(A, v0, target, diag_inv, mu, active, iterations,
                         omega, lam_cap=None):
    """Component-grouped Jacobi: identical math to ``solve_jacobi_xla`` but
    the iteration state lives in (B, K)/(B, 3K) arrays so every elementwise
    op is lane-dense on TPU (a (B, K, 3) array pads its 3-lane dim to 128).
    The system matrix is permuted once to [normals | t1s | t2s] ordering so
    the per-iteration matvec needs no interleaving relayouts."""
    import numpy as np

    B, K = mu.shape
    hp = jax.lax.Precision.HIGHEST
    cg = np.concatenate([np.arange(K) * 3 + c for c in range(3)])  # comp-grouped
    A_cg = A[:, cg][:, :, cg]                                      # (B, 3K, 3K)
    vn, v1, v2 = v0[..., 0], v0[..., 1], v0[..., 2]
    v0f = jnp.concatenate([vn, v1, v2], axis=1)                    # (B, 3K)
    tn, t1_, t2_ = target[..., 0], target[..., 1], target[..., 2]
    D = tuple(diag_inv[..., i, j] for i in range(3) for j in range(3))

    def body(_, lam):
        r = v0f + jnp.einsum("bij,bj->bi", A_cg, lam, precision=hp)
        en = tn - r[:, :K]
        e1 = t1_ - r[:, K : 2 * K]
        e2 = t2_ - r[:, 2 * K :]
        dn = D[0] * en + D[1] * e1 + D[2] * e2
        d1 = D[3] * en + D[4] * e1 + D[5] * e2
        d2 = D[6] * en + D[7] * e1 + D[8] * e2
        ln = jnp.maximum(lam[:, :K] + omega * dn, 0.0)
        if lam_cap is not None:
            ln = jnp.minimum(ln, lam_cap)
        l1 = lam[:, K : 2 * K] + omega * d1
        l2 = lam[:, 2 * K :] + omega * d2
        lt_norm = jnp.sqrt(l1 * l1 + l2 * l2) + 1e-9
        scale = jnp.minimum(1.0, mu * ln / lt_norm)
        return jnp.concatenate(
            [ln * active, l1 * scale * active, l2 * scale * active], axis=1
        )

    lam = jax.lax.fori_loop(0, iterations, body, jnp.zeros((B, 3 * K)))
    return jnp.stack([lam[:, :K], lam[:, K : 2 * K], lam[:, 2 * K :]], axis=-1)


def solve_jacobi(A, v0, target, diag_inv, mu, active, iterations, omega,
                 lam_cap=None):
    """Solver dispatch.

    Default is the XLA formulation: after removing the block-diagonal
    materialization it measures ~3ms vs the Pallas kernel's ~7ms at 4096 envs
    (XLA fuses the elementwise pipeline around the matvec; the kernel pays
    three extra permutation matmuls per iteration for Mosaic's 2D layout
    rules). The kernel is kept behind ASE_TPU_USE_PALLAS=1 as the substrate
    for a future fully-fused substep kernel."""
    import os

    if (_HAS_PALLAS and jax.default_backend() == "tpu"
            and os.environ.get("ASE_TPU_USE_PALLAS", "0") == "1"):
        return solve_jacobi_pallas(
            A, v0, target, diag_inv, mu, active, iterations, omega
        )
    if os.environ.get("ASE_TPU_SOLVER_SOA", "0") == "1":
        # measured SLOWER (7.3 vs 4.4 ms at B=4096): the one-time A
        # permutation gathers outweigh the lane-dense iteration; kept for
        # re-evaluation if K grows
        return solve_jacobi_xla_soa(
            A, v0, target, diag_inv, mu, active, iterations, omega, lam_cap
        )
    return solve_jacobi_xla(
        A, v0, target, diag_inv, mu, active, iterations, omega, lam_cap
    )
