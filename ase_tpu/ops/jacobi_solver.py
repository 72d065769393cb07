"""Projected block-Jacobi contact iteration (XLA formulations).

The contact impulse solve runs `iterations` rounds of
    r  = v0 + A lam
    dlam = Dinv . (target - r)          (3x3 block preconditioner)
    lam  = project_coulomb(lam + omega*dlam)
per environment. The default is the dense-A XLA formulation: XLA fuses the
elementwise pipeline around the bf16 matvec and measures fastest at B=4096,
K=24 on TPU v5e. A lane-dense SoA variant is kept behind
ASE_TPU_SOLVER_SOA=1 for re-evaluation at larger K (measured slower: the
one-time A permutation gathers outweigh the lane-dense iteration).

(A fused Pallas variant was benchmarked in round 1 and lost to XLA by ~2.3x
— Mosaic's 2D layout rules forced three extra permutation matmuls per
iteration — so it was deleted; the VMEM-residency win on this path is taken
by the fused Cholesky kernel in ops/pallas_chol.py instead.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


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
    """Solver dispatch (see module docstring for the measured choices)."""
    import os

    if os.environ.get("ASE_TPU_SOLVER_SOA", "0") == "1":
        return solve_jacobi_xla_soa(
            A, v0, target, diag_inv, mu, active, iterations, omega, lam_cap
        )
    return solve_jacobi_xla(
        A, v0, target, diag_inv, mu, active, iterations, omega, lam_cap
    )
