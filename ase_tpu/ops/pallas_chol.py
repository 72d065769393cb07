"""Fused batched Cholesky + triangular solves as single Pallas TPU kernels.

Why: the joint-space inertia factorization dominates the substep's *kernel
count*, not its FLOPs. The hand-unrolled batch-last XLA Cholesky emits ~4
small ops per column (sqrt, scale, dynamic-update-slice, trailing update) —
~150 dispatches of ~20 us each per substep, plus 2 triangular-solve custom
calls and layout copies (measured: ~5 ms of the 16.4 ms tick on TPU v5e at
B=4096). Fusing factor + forward substitution into ONE kernel keeps the
(nu, nu, B-tile) panel VMEM-resident across all columns: one dispatch, zero
intermediate HBM traffic.

Layouts are batch-last (n, n, B) / (n, m, B): the batch lives in the lane
dimension (128-dense), matrix rows in sublanes — every per-column panel op
is a full-width VPU op. This is the TPU replacement for the per-island
LDL^T factorizations PhysX runs inside its TGS solver (closed source; the
reference only configures it, ase/utils/config.py:135-142).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_TILE = 128  # batch lanes per grid step; in+out blocks are double-buffered,
             # so VMEM use ~ 4 * n*(n+m)*TILE*4 bytes (~8.7 MB at n=37, m=73)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def _fits_vmem(n: int, m: int) -> bool:
    # in+out blocks are double-buffered: 2 * ((n,n) + (n,m)) f32 tiles.
    # m = 3*max_contacts+1 is config-dependent, so gate on BOTH dims — a
    # large maxContacts must fall back to XLA instead of failing at compile.
    return n <= 64 and 4 * n * (n + m) * _TILE * 4 <= _VMEM_BUDGET


def chol_forward(M_bl: jnp.ndarray, rhs_bl: jnp.ndarray, rhs2_bl=None):
    """Factor M = L L^T and forward-substitute Y = L^{-1} rhs, fused.

    M_bl: (n, n, B) SPD, batch-last. rhs_bl: (n, m, B).
    Returns (L_bl (n, n, B) lower, Y_bl (n, m, B)) — plus Y2 (n, m2, B) when
    the optional second right-hand side ``rhs2_bl`` is given. Passing the
    small rhs separately instead of pre-concatenating keeps the big operand's
    producer layout intact: the (nu, 3K, B)+(nu, 1, B) concatenate fed to the
    kernel was a measured ~0.3 ms/tick copy at B=4096.

    Uses the Pallas kernel on TPU for well-shaped batches; otherwise an
    XLA fallback with identical semantics (tests run it on CPU).
    """
    n, _, B = M_bl.shape
    m = rhs_bl.shape[1]
    m2 = 0 if rhs2_bl is None else rhs2_bl.shape[1]
    if (
        jax.default_backend() == "tpu"
        and B % _TILE == 0
        and _fits_vmem(n, m + m2)
    ):
        if rhs2_bl is None:
            return _chol_forward_pallas(M_bl, rhs_bl)
        return _chol_forward2_pallas(M_bl, rhs_bl, rhs2_bl)
    if rhs2_bl is None:
        return _chol_forward_xla(M_bl, rhs_bl)
    L, Y = _chol_forward_xla(M_bl, jnp.concatenate([rhs_bl, rhs2_bl], axis=1))
    return L, Y[:, :m], Y[:, m:]


def back_solve(L_bl: jnp.ndarray, y_bl: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = y (backward substitution). L_bl (n, n, B), y (n, m, B)."""
    n, _, B = L_bl.shape
    if (
        jax.default_backend() == "tpu"
        and B % _TILE == 0
        and _fits_vmem(n, y_bl.shape[1])
    ):
        return _back_solve_pallas(L_bl, y_bl)
    return _back_solve_xla(L_bl, y_bl)


# -- XLA fallback (identical math, batch-first lax primitives) ---------------

def _chol_forward_xla(M_bl, rhs_bl):
    Mb = jnp.transpose(M_bl, (2, 0, 1))                 # (B, n, n)
    rhs = jnp.transpose(rhs_bl, (2, 0, 1))              # (B, n, m)
    L = jax.lax.linalg.cholesky(Mb, symmetrize_input=False)
    Y = jax.lax.linalg.triangular_solve(
        L, rhs, left_side=True, lower=True, transpose_a=False
    )
    return jnp.transpose(L, (1, 2, 0)), jnp.transpose(Y, (1, 2, 0))


def _back_solve_xla(L_bl, y_bl):
    L = jnp.transpose(L_bl, (2, 0, 1))
    y = jnp.transpose(y_bl, (2, 0, 1))
    x = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return jnp.transpose(x, (1, 2, 0))


# -- Pallas kernels -----------------------------------------------------------

def _chol_forward_kernel(n: int, m: int, m_ref, r_ref, l_ref, y_ref):
    """Right-looking Cholesky fused with forward substitution, all VMEM."""
    l_ref[...] = m_ref[...]
    y_ref[...] = r_ref[...]
    for k in range(n):
        akk = l_ref[k, k]                       # (Bt,)
        dinv = jax.lax.rsqrt(akk)
        l_ref[k, k] = akk * dinv                # = sqrt(akk)
        yk = y_ref[k] * dinv[None, :]           # (m, Bt)
        y_ref[k] = yk
        if k + 1 < n:
            col = l_ref[k + 1 :, k] * dinv[None, :]       # (n-k-1, Bt)
            l_ref[k + 1 :, k] = col
            l_ref[k + 1 :, k + 1 :] += -(col[:, None, :] * col[None, :, :])
            y_ref[k + 1 :] += -(col[:, None, :] * yk[None, :, :])


def _chol_forward2_kernel(n: int, m: int, m2: int,
                          m_ref, r_ref, r2_ref, l_ref, y_ref, y2_ref):
    """chol_forward with two right-hand sides kept as separate VMEM blocks
    (avoids the host-graph concatenate copy)."""
    l_ref[...] = m_ref[...]
    y_ref[...] = r_ref[...]
    y2_ref[...] = r2_ref[...]
    for k in range(n):
        akk = l_ref[k, k]                       # (Bt,)
        dinv = jax.lax.rsqrt(akk)
        l_ref[k, k] = akk * dinv                # = sqrt(akk)
        yk = y_ref[k] * dinv[None, :]           # (m, Bt)
        y_ref[k] = yk
        y2k = y2_ref[k] * dinv[None, :]         # (m2, Bt)
        y2_ref[k] = y2k
        if k + 1 < n:
            col = l_ref[k + 1 :, k] * dinv[None, :]       # (n-k-1, Bt)
            l_ref[k + 1 :, k] = col
            l_ref[k + 1 :, k + 1 :] += -(col[:, None, :] * col[None, :, :])
            y_ref[k + 1 :] += -(col[:, None, :] * yk[None, :, :])
            y2_ref[k + 1 :] += -(col[:, None, :] * y2k[None, :, :])


def _back_solve_kernel(n: int, m: int, l_ref, y_ref, x_ref):
    """x = L^{-T} y via right-looking backward substitution."""
    x_ref[...] = y_ref[...]
    for k in range(n - 1, -1, -1):
        dinv = jax.lax.rsqrt(l_ref[k, k] * l_ref[k, k])  # 1/L[k,k] (>0)
        xk = x_ref[k] * dinv[None, :]
        x_ref[k] = xk
        if k > 0:
            # row k of L = column k of L^T: propagate up
            x_ref[:k] += -(l_ref[k, :k][:, None, :] * xk[None, :, :])


@functools.partial(jax.jit, static_argnames=())
def _chol_forward_pallas(M_bl, rhs_bl):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, _, B = M_bl.shape
    m = rhs_bl.shape[1]
    grid = (B // _TILE,)
    kern = functools.partial(_chol_forward_kernel, n, m)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, n, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, B), M_bl.dtype),
            jax.ShapeDtypeStruct((n, m, B), rhs_bl.dtype),
        ],
    )(M_bl, rhs_bl)


@functools.partial(jax.jit, static_argnames=())
def _chol_forward2_pallas(M_bl, rhs_bl, rhs2_bl):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, _, B = M_bl.shape
    m = rhs_bl.shape[1]
    m2 = rhs2_bl.shape[1]
    grid = (B // _TILE,)
    kern = functools.partial(_chol_forward2_kernel, n, m, m2)

    def spec(d):
        return pl.BlockSpec((n, d, _TILE), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec(n), spec(m), spec(m2)],
        out_specs=[spec(n), spec(m), spec(m2)],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, B), M_bl.dtype),
            jax.ShapeDtypeStruct((n, m, B), rhs_bl.dtype),
            jax.ShapeDtypeStruct((n, m2, B), rhs2_bl.dtype),
        ],
    )(M_bl, rhs_bl, rhs2_bl)


@functools.partial(jax.jit, static_argnames=())
def _back_solve_pallas(L_bl, y_bl):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, _, B = L_bl.shape
    m = y_bl.shape[1]
    grid = (B // _TILE,)
    kern = functools.partial(_back_solve_kernel, n, m)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, m, _TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m, B), y_bl.dtype),
    )(L_bl, y_bl)
