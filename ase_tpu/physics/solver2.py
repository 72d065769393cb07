"""Component-grouped (TPU lane-dense) contact pipeline.

The vmapped ``solver.contact_jacobian`` materializes (B, K, 3, nu) tensors
whose (3, nu) minor dims tile-pad to (8, 128); this module builds the
transposed Jacobian directly in its consumer layout JT (B, nv, 3K) with the
3K columns grouped by contact-frame component [normals | t1 | t2], so:

* the articulation block of JT IS the rhs of the W = M^-1 J^T solve (no
  swapaxes copy),
* the Delassus assembly is one MXU contraction over the dof axis,
* per-contact 3x3 block quantities (diag inverse, projections, impulses)
  live in (B, K) component arrays.

Math is identical to ``solver.solve_batched`` (same Jacobi iteration,
Baumgarte bias, Coulomb projection, caps); parity pinned by
tests/test_solver2.py. Solver hyperparameters mirror the PhysX TGS block the
reference configures (reference ``ase/utils/config.py:135-142``).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.physics import model as M
from ase_tpu.physics.collision import Contacts
from ase_tpu.physics.solver import SolverConfig

_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _basis_comps(normal):
    """Orthonormal contact frame as component tuples of (B, K)."""
    n = tuple(normal[..., k] for k in range(3))
    use_z = jnp.abs(n[2]) < 0.9
    ref = (
        jnp.where(use_z, 0.0, 1.0),
        jnp.zeros_like(n[0]),
        jnp.where(use_z, 1.0, 0.0),
    )
    t1 = _cross(n, ref)
    t1n = jnp.maximum(jnp.sqrt(sum(c * c for c in t1)), 1e-9)
    t1 = tuple(c / t1n for c in t1)
    t2 = _cross(n, t1)
    return n, t1, t2


def contact_jacobian_t(
    model: M.Model,
    contacts: Contacts,     # batched (B, K, ...)
    Phi: jnp.ndarray,       # (B, nu, 6)
    Amask: jnp.ndarray,     # (nb, nu) static
    origin: jnp.ndarray,    # (B, 3)
    prop_pos: jnp.ndarray,  # (B, np, 3)
):
    """JT (B, nv, 3K), columns grouped [n-block | t1-block | t2-block]."""
    B, K = contacts.depth.shape
    nb, nu = model.nb, model.nu

    n, t1, t2 = _basis_comps(contacts.normal)
    lever = tuple(contacts.pos[..., k] - origin[:, k : k + 1] for k in range(3))
    Pa = tuple(Phi[..., k] for k in range(3))            # (B, nu) angular
    Pl = tuple(Phi[..., 3 + k] for k in range(3))        # linear

    # ancestor-dof masks via one-hot MXU contraction (exact: 0/1 weights)
    ar_nb = jnp.arange(nb)
    oh_a = (contacts.body_a[..., None] == ar_nb).astype(jnp.float32)  # (B,K,nb)
    oh_b = (contacts.body_b[..., None] == ar_nb).astype(jnp.float32)
    mdiff = _einsum("bkc,cv->bvk", oh_a - oh_b, Amask)   # (B, nu, K)

    def art_block(b):
        c = _cross(lever, b)
        core = sum(
            Pl[x][:, :, None] * b[x][:, None, :] + Pa[x][:, :, None] * c[x][:, None, :]
            for x in range(3)
        )                                                # (B, nu, K)
        return mdiff * core

    JT_art = jnp.concatenate(
        [art_block(n), art_block(t1), art_block(t2)], axis=2
    )                                                    # (B, nu, 3K)

    if model.num_props == 0:
        return JT_art

    rows = []
    for p in range(model.num_props):
        pid = nb + p
        sgn = (
            (contacts.body_a == pid).astype(jnp.float32)
            - (contacts.body_b == pid).astype(jnp.float32)
        )                                                # (B, K)
        r = tuple(
            contacts.pos[..., k] - prop_pos[:, p, k : k + 1] for k in range(3)
        )
        lin_rows = [[], [], []]   # per component x/y/z: 3 blocks (n, t1, t2)
        ang_rows = [[], [], []]
        for b in (n, t1, t2):
            rxb = _cross(r, b)
            for x in range(3):
                lin_rows[x].append(b[x] * sgn)
                ang_rows[x].append(rxb[x] * sgn)
        for x in range(3):
            rows.append(jnp.concatenate(lin_rows[x], axis=1))   # (B, 3K)
        for x in range(3):
            rows.append(jnp.concatenate(ang_rows[x], axis=1))
    JT_prop = jnp.stack(rows, axis=1)                    # (B, np*6, 3K)
    return jnp.concatenate([JT_art, JT_prop], axis=1)


def contact_jacobian_t_bl(
    model: M.Model,
    contacts: Contacts,     # batched (B, K, ...)
    Phi: jnp.ndarray,       # (B, nu, 6)
    Amask: jnp.ndarray,     # (nb, nu) static
    origin: jnp.ndarray,    # (B, 3)
    prop_pos: jnp.ndarray,  # (B, np, 3)
):
    """Batch-last twin of :func:`contact_jacobian_t`.

    Returns (JT_art_bl (nu, 3K, B), JT_prop (B, np*6, 3K) or None). The
    articulation block is born in the (nu, 3K, B) layout the Z-form solve
    consumes directly (rhs concat + forward substitution), eliminating the
    ~44 MB (B, nu, 3K) -> (nu, 3K, B) transpose the engine paid per substep
    (trace-measured layout copies ~0.6 ms/substep at 4096 envs). Parity with
    the batch-first builder is pinned in tests/test_solver2.py.
    """
    B, K = contacts.depth.shape
    nb, nu = model.nb, model.nu

    n, t1, t2 = _basis_comps(contacts.normal)
    lever = tuple(contacts.pos[..., k] - origin[:, k : k + 1] for k in range(3))
    # batch-last component planes
    Pa = tuple(Phi[..., k].T for k in range(3))          # (nu, B) angular
    Pl = tuple(Phi[..., 3 + k].T for k in range(3))      # linear

    # ancestor-dof masks, output born (nu, K, B): dot_general output dim
    # order is (lhs free v, rhs free k, b) — no transpose inserted
    oh = (
        (contacts.body_a[..., None] == jnp.arange(nb)).astype(jnp.float32)
        - (contacts.body_b[..., None] == jnp.arange(nb)).astype(jnp.float32)
    )                                                    # (B, K, nb)
    mdiff = _einsum("cv,bkc->vkb", Amask, oh)            # (nu, K, B)

    def art_block(b):
        c = _cross(lever, b)
        core = sum(
            Pl[x][:, None, :] * b[x].T[None, :, :]
            + Pa[x][:, None, :] * c[x].T[None, :, :]
            for x in range(3)
        )                                                # (nu, K, B)
        return mdiff * core

    JT_art_bl = jnp.concatenate(
        [art_block(n), art_block(t1), art_block(t2)], axis=1
    )                                                    # (nu, 3K, B)

    if model.num_props == 0:
        return JT_art_bl, None

    rows = []
    for p in range(model.num_props):
        pid = nb + p
        sgn = (
            (contacts.body_a == pid).astype(jnp.float32)
            - (contacts.body_b == pid).astype(jnp.float32)
        )                                                # (B, K)
        r = tuple(
            contacts.pos[..., k] - prop_pos[:, p, k : k + 1] for k in range(3)
        )
        lin_rows = [[], [], []]
        ang_rows = [[], [], []]
        for b in (n, t1, t2):
            rxb = _cross(r, b)
            for x in range(3):
                lin_rows[x].append(b[x] * sgn)
                ang_rows[x].append(rxb[x] * sgn)
        for x in range(3):
            rows.append(jnp.concatenate(lin_rows[x], axis=1))   # (B, 3K)
        for x in range(3):
            rows.append(jnp.concatenate(ang_rows[x], axis=1))
    JT_prop = jnp.stack(rows, axis=1)                    # (B, np*6, 3K)
    return JT_art_bl, JT_prop


def _inv3_comps(D):
    """Adjugate inverse of 3x3 blocks given as a (3,3) nest of (B,K)."""
    a, b, c = D[0][0], D[0][1], D[0][2]
    d, e, f = D[1][0], D[1][1], D[1][2]
    g, h, i = D[2][0], D[2][1], D[2][2]
    A = e * i - f * h
    Bc = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * Bc + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    return (
        (A * inv_det, (c * h - b * i) * inv_det, (b * f - c * e) * inv_det),
        (Bc * inv_det, (a * i - c * g) * inv_det, (c * d - a * f) * inv_det),
        (C * inv_det, (b * g - a * h) * inv_det, (a * e - b * d) * inv_det),
    )


def solve_batched_t(
    model: M.Model,
    contacts: Contacts,      # batched (B, K, ...)
    JT: jnp.ndarray,         # (B, nv, 3K) component-grouped
    W: jnp.ndarray,          # (B, nv, 3K) = M^{-1} J^T, same ordering
    u_free: jnp.ndarray,     # (B, nv)
    dt: float,
    cfg: SolverConfig,
):
    """Contact solve in component-grouped layout. Returns
    (u_new (B, nv), lam (B, K, 3), body_forces (B, nb+np, 3))."""
    A = _einsum("bvi,bvj->bij", JT, W)
    v0f = _einsum("bvi,bv->bi", JT, u_free)              # (B, 3K) cg order
    lam_f = jacobi_lambda(contacts, A, v0f, dt, cfg)
    u_new = u_free + _einsum("bvj,bj->bv", W, lam_f)
    body_forces = body_forces_from_lambda(model, contacts, lam_f, dt)
    K = contacts.depth.shape[1]
    lam = jnp.stack(
        [lam_f[:, :K], lam_f[:, K : 2 * K], lam_f[:, 2 * K :]], axis=-1
    )
    return u_new, lam, body_forces


def jacobi_lambda(
    contacts: Contacts,      # batched (B, K, ...)
    A: jnp.ndarray,          # (B, 3K, 3K) Delassus, component-grouped (no reg)
    v0f: jnp.ndarray,        # (B, 3K) free contact-frame velocities
    dt: float,
    cfg: SolverConfig,
    restitution=None,        # optional (B,) coefficient of restitution
    vn_pre=None,             # (B, K) pre-solve normal contact velocities
):
    """Block-Jacobi Coulomb iteration on a precomputed Delassus operator.
    Returns the converged impulse vector lam (B, 3K), component-grouped.

    With ``restitution``/``vn_pre`` given, impacting contacts get a Newton
    bounce target: the normal velocity is driven to ``e·max(-vn_pre, 0)`` on
    top of the Baumgarte bias (PhysX material restitution parity; exercised
    by the domain-randomization rigid_shape_properties.restitution knob).

    The Tikhonov regularization is folded into the iteration residual
    (``r += reg*lam``) instead of materializing ``A + reg*I`` — the add was a
    full (B, 3K, 3K) layout copy on TPU. Under bf16 iteration the diagonal
    preconditioner blocks are also read from the bf16 operator: this leaves
    the bf16 convert as f32 A's ONLY consumer, so XLA fuses the convert into
    the Delassus einsum (single half-width write), and the whole-operator
    transpose that block extraction costs runs on half the bytes. D only
    scales/clamps the per-block updates, so bf16 rounding (~0.4% relative)
    perturbs the iteration path, not the fixed point it projects onto.
    """
    B, K = contacts.depth.shape

    n_ok = jnp.abs(jnp.sum(jnp.square(contacts.normal), axis=-1) - 1.0) < 0.1
    active = ((contacts.depth > -cfg.contact_offset) & n_ok).astype(jnp.float32)
    mu = contacts.friction * active

    reg = cfg.regularization

    # Baumgarte depenetration for touching contacts + speculative approach
    # allowance gap/dt for separated-but-near contacts (PhysX contactOffset
    # semantics): vn is constrained to >= depth/dt, stopping an approaching
    # body exactly at touchdown even though detection ran at tick start
    v_bias = jnp.minimum(
        cfg.baumgarte / dt * jnp.maximum(contacts.depth - cfg.slop, 0.0),
        cfg.max_depenetration_velocity,
    ) + jnp.minimum(contacts.depth, 0.0) / dt
    if restitution is not None and vn_pre is not None:
        v_bias = v_bias + restitution[:, None] * jnp.maximum(-vn_pre, 0.0)

    A_it = A.astype(jnp.bfloat16) if cfg.matvec_bf16 else A

    # 3x3 diagonal blocks of the regularized operator (from the iteration
    # matrix — see docstring)
    A5 = A_it.reshape(B, 3, K, 3, K)
    dblk = jnp.diagonal(A5, axis1=2, axis2=4).astype(jnp.float32)  # (B,3,3,K)
    D = [[dblk[:, i, j] + (reg + 1e-5 if i == j else 0.0) for j in range(3)] for i in range(3)]
    Dinv = _inv3_comps(D)

    active = active * (D[0][0] > 1e-4).astype(jnp.float32)
    mu = mu * active
    lam_cap = cfg.impulse_cap_velocity / jnp.maximum(D[0][0], 1e-3)

    omega = cfg.relaxation
    mv_kw = (
        dict(preferred_element_type=jnp.float32)
        if A_it.dtype == jnp.bfloat16
        else dict(precision=jax.lax.Precision.HIGHEST)
    )

    def body(_, lam):
        r = v0f + reg * lam + jnp.einsum(
            "bij,bj->bi", A_it, lam.astype(A_it.dtype), **mv_kw
        ).astype(jnp.float32)
        en = v_bias - r[:, :K]
        e1 = -r[:, K : 2 * K]
        e2 = -r[:, 2 * K :]
        dn = Dinv[0][0] * en + Dinv[0][1] * e1 + Dinv[0][2] * e2
        d1 = Dinv[1][0] * en + Dinv[1][1] * e1 + Dinv[1][2] * e2
        d2 = Dinv[2][0] * en + Dinv[2][1] * e1 + Dinv[2][2] * e2
        ln = jnp.minimum(jnp.maximum(lam[:, :K] + omega * dn, 0.0), lam_cap)
        l1 = lam[:, K : 2 * K] + omega * d1
        l2 = lam[:, 2 * K :] + omega * d2
        lt_norm = jnp.sqrt(l1 * l1 + l2 * l2) + 1e-9
        scale = jnp.minimum(1.0, mu * ln / lt_norm)
        return jnp.concatenate(
            [ln * active, l1 * scale * active, l2 * scale * active], axis=1
        )

    # Unrolling puts several matvecs in one loop-body region (fewer loop
    # boundary syncs for a dispatch-latency-bound iteration). Measured on
    # TPU v5e at 4096 envs: unroll=4 bench 169.7k -> 172.4k steps/s/chip;
    # override with ASE_TPU_JACOBI_UNROLL.
    unroll = int(os.environ.get("ASE_TPU_JACOBI_UNROLL", "4"))
    return jax.lax.fori_loop(0, cfg.iterations, body, jnp.zeros((B, 3 * K)),
                             unroll=unroll)


def body_forces_from_lambda(model: M.Model, contacts: Contacts,
                            lam_f: jnp.ndarray, dt: float,
                            contact_offset: float = 0.0) -> jnp.ndarray:
    """World-frame per-body contact forces via one-hot MXU scatters."""
    K = contacts.depth.shape[1]
    n_ok = jnp.abs(jnp.sum(jnp.square(contacts.normal), axis=-1) - 1.0) < 0.1
    active = ((contacts.depth > -contact_offset) & n_ok).astype(jnp.float32)
    n, t1, t2 = _basis_comps(contacts.normal)
    ln, l1, l2 = lam_f[:, :K], lam_f[:, K : 2 * K], lam_f[:, 2 * K :]
    f = tuple((ln * nk + l1 * t1k + l2 * t2k) / dt for nk, t1k, t2k in zip(n, t1, t2))
    nbp = model.nb + model.num_props
    ar = jnp.arange(nbp)
    oh_a = (contacts.body_a[..., None] == ar).astype(jnp.float32) * active[..., None]
    oh_b = (contacts.body_b[..., None] == ar).astype(jnp.float32) * active[..., None]
    oh = oh_a - oh_b                                     # (B, K, nbp)
    return jnp.stack(
        [_einsum("bkc,bk->bc", oh, fk) for fk in f], axis=-1
    )                                                    # (B, nbp, 3)
