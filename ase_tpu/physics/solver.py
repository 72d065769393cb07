"""Velocity-level contact impulse solver (projected Gauss-Seidel).

The TPU-native counterpart of PhysX's TGS iterative contact solver configured
by the reference env YAMLs (``sim.physx`` block: solver_type/iteration counts;
reference ``ase/utils/config.py:135-142``). Operates on the generalized system
(articulation dofs + free-prop dofs): contact Jacobians are projected into
joint space, impulses solved with PGS sweeps over a fixed-size contact set,
and the velocity update applied through the articulation mass matrix — so
contacts correctly couple through the whole kinematic chain.

Everything is static-shape; inactive contacts (depth<=0 padding from top_k)
are masked to zero impulse.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ase_tpu.ops import spatial as sp
from ase_tpu.physics import model as M
from ase_tpu.physics.collision import Contacts

_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class SolverConfig(NamedTuple):
    iterations: int = 8
    baumgarte: float = 0.2
    slop: float = 0.002
    max_depenetration_velocity: float = 10.0  # PhysX param parity
    regularization: float = 1e-6


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
    """J (K, 3, nv): rows map generalized velocity -> contact-frame relative
    velocity [n, t1, t2] of body_a w.r.t. body_b."""
    K = contacts.pos.shape[0]
    nv = model.nv
    nb = model.nb

    t1, t2 = _tangent_basis(contacts.normal)
    basis = jnp.stack([contacts.normal, t1, t2], axis=1)  # (K, 3, 3)

    def body_point_jac(b, p):
        """(3, nv) jacobian of world velocity of point p on body b."""
        # articulation side (b < nb): v_p = phi_lin + phi_ang x (p - origin)
        lever = p - origin
        Jp_art = Phi[:, 3:6] + jnp.cross(Phi[:, 0:3], jnp.broadcast_to(lever, (model.nu, 3)))
        mask = jnp.where(b >= 0, Amask[jnp.clip(b, 0, nb - 1)], jnp.zeros(model.nu))
        mask = jnp.where(b < nb, mask, jnp.zeros(model.nu))
        J = jnp.zeros((3, nv)).at[:, : model.nu].set((mask[:, None] * Jp_art).T)

        if model.num_props > 0:
            # prop side: v_p = v + w x (p - c)
            k = jnp.clip(b - nb, 0, model.num_props - 1)
            r = p - prop_pos[k]
            Jl = jnp.eye(3)
            Jw = -sp.skew(r)
            is_prop = (b >= nb)
            block = jnp.concatenate([Jl, Jw], axis=1) * is_prop
            J = jax.lax.dynamic_update_slice(
                J, J[:, model.nu + 6 * k : model.nu + 6 * k + 6] + block,
                (0, model.nu + 6 * k),
            )
        return J

    Ja = jax.vmap(body_point_jac)(contacts.body_a, contacts.pos)
    Jb = jax.vmap(body_point_jac)(contacts.body_b, contacts.pos)
    return _einsum("kij,kjv->kiv", basis, Ja - Jb)


def make_minv_apply(model: M.Model, chol, prop_R):
    """Returns f(X: (nv, m)) = M^{-1} X using block structure:
    dense Cholesky for the articulation, closed-form 6x6 for each prop."""

    def apply(X):
        top = jax.scipy.linalg.cho_solve((chol, True), X[: model.nu])
        if model.num_props == 0:
            return top
        outs = [top]
        for k in range(model.num_props):
            blk = X[model.nu + 6 * k : model.nu + 6 * k + 6]
            m = model.mass[model.nb + k]
            I_w = _einsum(
                "ij,jk,lk->il", prop_R[k], model.inertia[model.nb + k], prop_R[k]
            )
            lin = blk[0:3] / m
            ang = jnp.linalg.solve(I_w, blk[3:6])
            outs.append(jnp.concatenate([lin, ang], axis=0))
        return jnp.concatenate(outs, axis=0)

    return apply


def solve(
    model: M.Model,
    contacts: Contacts,
    J: jnp.ndarray,          # (K, 3, nv)
    minv_apply,
    u_free: jnp.ndarray,     # (nv,)
    dt: float,
    cfg: SolverConfig,
):
    """PGS over contacts. Returns (u_new, lambda (K,3), body_forces (nb+np,3))."""
    K = J.shape[0]
    nv = J.shape[-1]

    active = contacts.depth > 0.0
    mu = contacts.friction * active

    Jf = J.reshape(K * 3, nv)
    W = minv_apply(Jf.T)                      # (nv, 3K)
    A = _einsum("iv,vj->ij", Jf, W)           # (3K, 3K)
    A = A + cfg.regularization * jnp.eye(K * 3)
    Ablk = A.reshape(K, 3, K, 3)

    # desired normal velocity (Baumgarte stabilization, PhysX-style clamp)
    v_bias = jnp.minimum(
        cfg.baumgarte / dt * jnp.maximum(contacts.depth - cfg.slop, 0.0),
        cfg.max_depenetration_velocity,
    )
    v0 = _einsum("kiv,v->ki", J, u_free)      # (K, 3)

    ar = jnp.arange(K)
    diag = Ablk[ar, :, ar, :]  # (K, 3, 3)
    diag_inv = jnp.linalg.inv(diag)

    def sweep(_, lam):
        def body(carry, k):
            lam = carry
            vk = v0[k] + _einsum("ijl,jl->i", Ablk[k], lam)
            target = jnp.array([v_bias[k], 0.0, 0.0])
            dlam = _einsum("ij,j->i", diag_inv[k], target - vk)
            new = lam[k] + dlam
            # project: non-negative normal, Coulomb disc for friction
            ln = jnp.maximum(new[0], 0.0)
            lt = new[1:3]
            lt_norm = jnp.linalg.norm(lt) + 1e-9
            scale = jnp.minimum(1.0, mu[k] * ln / lt_norm)
            new = jnp.concatenate([ln[None], lt * scale]) * active[k]
            lam = lam.at[k].set(new)
            return lam, None

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
    body_forces = body_forces.at[bb].add(-f_world * (active & has_b)[:, None])

    return u_new, lam, body_forces
