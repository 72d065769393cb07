"""Velocity-level contact impulse solver.

The TPU-native counterpart of PhysX's TGS iterative contact solver configured
by the reference env YAMLs (``sim.physx`` block, reference
``ase/utils/config.py:135-142``). Contacts are solved on the generalized
system (articulation dofs + free-prop dofs): Jacobians projected into joint
space, impulses solved iteratively, velocities updated through the
articulation mass matrix so contacts couple through the whole kinematic chain.

Two iteration schemes:

* ``jacobi`` (default): block-preconditioned projected Jacobi with
  under-relaxation. Every iteration is ONE batched (3K×3K) matvec plus
  elementwise projection — no sequential per-contact loop — which is the
  shape TPUs want (the classic Gauss-Seidel sweep serializes into hundreds of
  tiny kernels).
* ``pgs``: classic sequential projected Gauss-Seidel (better per-iteration
  convergence; used for small-batch validation runs).

Everything is static-shape; inactive contacts (depth<=0 padding from top_k)
are masked to zero impulse.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ase_tpu.ops import jacobi_solver, linalg3
from ase_tpu.ops import spatial as sp
from ase_tpu.physics import model as M
from ase_tpu.physics.collision import Contacts

_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class SolverConfig(NamedTuple):
    iterations: int = 16               # 16 vs 24 measured identical standing
                                       # accuracy (fz/mg 1.002) and random-
                                       # action stability; PhysX runs 4 TGS
                                       # position iters on this config
    relaxation: float = 0.35           # Jacobi under-relaxation (must stay
                                       # below ~1/coupling for foot-corner
                                       # clusters or the iteration diverges)
    scheme: str = "jacobi"             # "jacobi" | "pgs"
    baumgarte: float = 0.2
    slop: float = 0.002
    max_depenetration_velocity: float = 10.0  # PhysX param parity
    impulse_cap_velocity: float = 25.0 # max normal Δv one contact may inject
    regularization: float = 1e-6
    matvec_bf16: bool = True           # bf16 Delassus matvec (f32 accumulate);
                                       # ~0.4% iterate noise, inside solver tol
    contact_offset: float = 0.02       # PhysX contactOffset parity: contacts
                                       # within this gap enter the solve as
                                       # SPECULATIVE constraints (vn >= gap/h),
                                       # stopping bodies exactly at touchdown.
                                       # Required for once-per-tick narrow
                                       # phase: a contact forming mid-tick is
                                       # otherwise invisible until the next
                                       # detection (reference sim params
                                       # cfg/humanoid_sword_shield.yaml:36)


def _tangent_basis(n: jnp.ndarray):
    """Orthonormal tangents for each normal (K,3) -> (K,3),(K,3)."""
    ref = jnp.where(
        (jnp.abs(n[..., 2:3]) < 0.9),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def contact_jacobian(
    model: M.Model,
    contacts: Contacts,
    Phi: jnp.ndarray,       # (nu, 6) articulation dof axes at `origin`
    Amask: jnp.ndarray,     # (nb, nu)
    origin: jnp.ndarray,    # (3,)
    prop_pos: jnp.ndarray,  # (np, 3)
) -> jnp.ndarray:
    """J (K, 3, nv): generalized velocity -> contact-frame relative velocity
    [n, t1, t2] of body_a w.r.t. body_b. Fully vectorized (no scatters)."""
    K = contacts.pos.shape[0]
    nb = model.nb
    nu = model.nu

    t1, t2 = _tangent_basis(contacts.normal)
    basis = jnp.stack([contacts.normal, t1, t2], axis=1)  # (K, 3, 3)

    # articulation part: the point jacobian is the same for any body at this
    # point; only the ancestor-dof mask differs, so J_rel = (mask_a-mask_b)⊙Jp.
    # Projected form (avoids the (K,nu,3) cross-product intermediate):
    #   J[k,i,v] = m[k,v]·( basis[k,i]·Φ_lin[v] + (lever[k]×basis[k,i])·Φ_ang[v] )
    lever = contacts.pos - origin[None, :]                       # (K, 3)
    C = jnp.cross(lever[:, None, :], basis)                      # (K, 3, 3)
    B1 = _einsum("kij,vj->kiv", basis, Phi[:, 3:6])
    B2 = _einsum("kij,vj->kiv", C, Phi[:, 0:3])
    Jp_proj = B1 + B2                                            # (K, 3, nu)

    def art_mask(b):
        valid = (b >= 0) & (b < nb)
        return jnp.where(valid, Amask[jnp.clip(b, 0, nb - 1)], jnp.zeros(nu))

    m_a = jax.vmap(art_mask)(contacts.body_a)                    # (K, nu)
    m_b = jax.vmap(art_mask)(contacts.body_b)
    J_art_proj = (m_a - m_b)[:, None, :] * Jp_proj               # (K, 3, nu)

    if model.num_props > 0:
        npr = model.num_props
        prop_ids = nb + jnp.arange(npr)                          # (np,)
        s_a = (contacts.body_a[:, None] == prop_ids[None, :]).astype(jnp.float32)
        s_b = (contacts.body_b[:, None] == prop_ids[None, :]).astype(jnp.float32)
        sgn = s_a - s_b                                          # (K, np)
        r = contacts.pos[:, None, :] - prop_pos[None, :, :]      # (K, np, 3)
        eye = jnp.broadcast_to(jnp.eye(3), (K, npr, 3, 3))
        Jw = -sp.skew(r)                                         # (K, np, 3, 3)
        blocks = jnp.concatenate([eye, Jw], axis=-1)             # (K, np, 3, 6) rows=v_p dims, cols=[lin, ang]
        blocks = blocks * sgn[:, :, None, None]
        # project into contact frame then lay out as (K, 3, np*6)
        J_prop_proj = _einsum("kij,kpjc->kipc", basis, blocks).reshape(K, 3, npr * 6)
        return jnp.concatenate([J_art_proj, J_prop_proj], axis=2)  # (K, 3, nv)
    return J_art_proj


def _project(lam_blocks, mu, active):
    """Coulomb cone projection per contact block (K,3)."""
    ln = jnp.maximum(lam_blocks[:, 0], 0.0)
    lt = lam_blocks[:, 1:3]
    lt_norm = jnp.linalg.norm(lt, axis=-1) + 1e-9
    scale = jnp.minimum(1.0, mu * ln / lt_norm)
    return jnp.concatenate([ln[:, None], lt * scale[:, None]], axis=-1) * active[:, None]


def solve(
    model: M.Model,
    contacts: Contacts,
    J: jnp.ndarray,          # (K, 3, nv)
    W: jnp.ndarray,          # (nv, 3K) = M^{-1} J^T (precomputed, batched-solve)
    u_free: jnp.ndarray,     # (nv,)
    dt: float,
    cfg: SolverConfig,
):
    """Solve contact impulses. Returns (u_new, lambda (K,3), body_forces)."""
    K = J.shape[0]
    nv = J.shape[-1]

    n_ok = jnp.abs(jnp.sum(jnp.square(contacts.normal), axis=-1) - 1.0) < 0.1
    active = ((contacts.depth > -cfg.contact_offset) & n_ok).astype(jnp.float32)
    mu = contacts.friction * active

    Jf = J.reshape(K * 3, nv)
    A = _einsum("iv,vj->ij", Jf, W)           # (3K, 3K)
    A = A + cfg.regularization * jnp.eye(K * 3)
    Ablk = A.reshape(K, 3, K, 3)

    # desired normal velocity: Baumgarte depenetration for touching contacts
    # (PhysX-style clamp) + speculative approach allowance gap/dt for
    # contacts still separated by up to contact_offset
    v_bias = jnp.minimum(
        cfg.baumgarte / dt * jnp.maximum(contacts.depth - cfg.slop, 0.0),
        cfg.max_depenetration_velocity,
    ) + jnp.minimum(contacts.depth, 0.0) / dt
    target = jnp.concatenate(
        [v_bias[:, None], jnp.zeros((K, 2))], axis=-1
    )                                         # (K, 3)
    v0 = _einsum("kiv,v->ki", J, u_free)      # (K, 3)

    ar = jnp.arange(K)
    diag = Ablk[ar, :, ar, :]                 # (K, 3, 3)
    diag = diag + 1e-5 * jnp.eye(3)
    diag_inv = linalg3.inv3(diag)

    if cfg.scheme == "jacobi":
        omega = cfg.relaxation

        def it(_, lam):
            r = v0 + _einsum("ij,j->i", A, lam.reshape(-1)).reshape(K, 3)
            dlam = _einsum("kij,kj->ki", diag_inv, target - r)
            return _project(lam + omega * dlam, mu, active)

        lam = jax.lax.fori_loop(0, cfg.iterations, it, jnp.zeros((K, 3)))
    else:  # sequential PGS (reference-style solver sweeps)
        def sweep(_, lam):
            def body(lam, k):
                vk = v0[k] + _einsum("ijl,jl->i", Ablk[k], lam)
                dlam = _einsum("ij,j->i", diag_inv[k], target[k] - vk)
                new = _project((lam[k] + dlam)[None], mu[k][None], active[k][None])[0]
                return lam.at[k].set(new), None

            lam, _ = jax.lax.scan(body, lam, jnp.arange(K))
            return lam

        lam = jax.lax.fori_loop(0, cfg.iterations, sweep, jnp.zeros((K, 3)))

    impulse = _einsum("vj,j->v", W, lam.reshape(-1))
    u_new = u_free + impulse

    # world-frame contact forces per body (for the net-contact-force tensor,
    # reference humanoid.py:91-92 / termination logic 644-670)
    t1, t2 = _tangent_basis(contacts.normal)
    f_world = (
        lam[:, 0:1] * contacts.normal + lam[:, 1:2] * t1 + lam[:, 2:3] * t2
    ) / dt
    nbp = model.nb + model.num_props
    body_forces = jnp.zeros((nbp, 3))
    ba = jnp.clip(contacts.body_a, 0, nbp - 1)
    body_forces = body_forces.at[ba].add(f_world * active[:, None])
    has_b = contacts.body_b >= 0
    bb = jnp.clip(contacts.body_b, 0, nbp - 1)
    body_forces = body_forces.at[bb].add(
        -f_world * (active * has_b.astype(jnp.float32))[:, None]
    )

    return u_new, lam, body_forces


def solve_batched(
    model: M.Model,
    contacts: Contacts,      # batched (B, K, ...)
    J: jnp.ndarray,          # (B, K, 3, nv)
    W: jnp.ndarray,          # (B, nv, 3K)
    u_free: jnp.ndarray,     # (B, nv)
    dt: float,
    cfg: SolverConfig,
):
    """Batched contact solve (AoS A/B path); Jacobi iterations via
    ops/jacobi_solver.py. Returns (u_new, lam (B,K,3), body_forces)."""
    B, K = contacts.depth.shape
    nv = J.shape[-1]

    # reject degenerate contacts: non-unit normals (coincident geoms) and
    # rows with near-zero effective inverse mass, which would turn the
    # Baumgarte bias into an unbounded impulse
    n_ok = jnp.abs(jnp.sum(jnp.square(contacts.normal), axis=-1) - 1.0) < 0.1
    active = ((contacts.depth > -cfg.contact_offset) & n_ok).astype(jnp.float32)
    mu = contacts.friction * active

    Jf = J.reshape(B, K * 3, nv)
    A = _einsum("bim,bmj->bij", Jf, W)
    A = A + cfg.regularization * jnp.eye(K * 3)[None]

    # Baumgarte depenetration + speculative approach allowance (see solve())
    v_bias = jnp.minimum(
        cfg.baumgarte / dt * jnp.maximum(contacts.depth - cfg.slop, 0.0),
        cfg.max_depenetration_velocity,
    ) + jnp.minimum(contacts.depth, 0.0) / dt
    target = jnp.concatenate([v_bias[..., None], jnp.zeros((B, K, 2))], axis=-1)
    v0 = _einsum("bkiv,bv->bki", J, u_free)

    A4 = A.reshape(B, K, 3, K, 3)
    ar = jnp.arange(K)
    diag = jnp.transpose(A4[:, ar, :, ar, :], (1, 0, 2, 3))  # (B, K, 3, 3)
    diag = diag + 1e-5 * jnp.eye(3)[None, None]
    diag_inv = linalg3.inv3(diag)

    # rows whose own diagonal is tiny are uncontrollable — deactivate
    active = active * (diag[..., 0, 0] > 1e-4).astype(jnp.float32)
    mu = mu * active

    if cfg.scheme == "jacobi":
        # divergence guard: cap each contact's normal impulse by the impulse
        # that would inject impulse_cap_velocity through its own diagonal
        lam_cap = cfg.impulse_cap_velocity / jnp.maximum(diag[..., 0, 0], 1e-3)
        A_it = A.astype(jnp.bfloat16) if cfg.matvec_bf16 else A
        lam = jacobi_solver.solve_jacobi(
            A_it, v0, target, diag_inv, mu, active, cfg.iterations,
            cfg.relaxation, lam_cap,
        )
    else:
        lam = jax.vmap(
            lambda Ab, v0b, tb, db, mb, ab: _pgs_iterate(
                Ab, v0b, tb, db, mb, ab, cfg.iterations
            )
        )(A, v0, target, diag_inv, mu, active)

    impulse = _einsum("bvj,bj->bv", W, lam.reshape(B, -1))
    u_new = u_free + impulse

    t1, t2 = _tangent_basis(contacts.normal)
    f_world = (
        lam[..., 0:1] * contacts.normal + lam[..., 1:2] * t1 + lam[..., 2:3] * t2
    ) / dt
    nbp = model.nb + model.num_props
    ba = jnp.clip(contacts.body_a, 0, nbp - 1)
    bb = jnp.clip(contacts.body_b, 0, nbp - 1)
    has_b = (contacts.body_b >= 0).astype(jnp.float32)

    def scatter(fw, ia, ib, act, hb):
        bf = jnp.zeros((nbp, 3))
        bf = bf.at[ia].add(fw * act[:, None])
        return bf.at[ib].add(-fw * (act * hb)[:, None])

    body_forces = jax.vmap(scatter)(f_world, ba, bb, active, has_b)
    return u_new, lam, body_forces


def _pgs_iterate(A, v0, target, diag_inv, mu, active, iterations):
    """Sequential projected Gauss-Seidel (single env; validation path)."""
    K = mu.shape[0]
    Ablk = A.reshape(K, 3, K, 3)

    def sweep(_, lam):
        def body(lam, k):
            vk = v0[k] + _einsum("ijl,jl->i", Ablk[k], lam)
            dlam = _einsum("ij,j->i", diag_inv[k], target[k] - vk)
            new = _project((lam[k] + dlam)[None], mu[k][None], active[k][None])[0]
            return lam.at[k].set(new), None

        lam, _ = jax.lax.scan(body, lam, jnp.arange(K))
        return lam

    return jax.lax.fori_loop(0, iterations, sweep, jnp.zeros((K, 3)))
