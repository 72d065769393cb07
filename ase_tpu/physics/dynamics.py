"""Articulated rigid-body dynamics: FK, mass matrix, bias forces, Stable-PD.

Single-environment pure functions (batch via ``jax.vmap`` in the engine). The
formulation is a world-frame Jacobian/CRBA approach chosen for TPUs: instead of
serial Featherstone propagation, the mass matrix and bias torques are assembled
with dense masked einsums over (bodies × dofs), which XLA maps onto the
MXU/VPU, and forward dynamics is one small Cholesky solve. This replaces the
PhysX reduced-coordinate articulation stepped by the reference via
``gym.simulate`` (reference ``ase/env/tasks/base_task.py:403-407``).

Joint drive model: Stable PD (implicit damping) — the PD position/velocity
gains come from the MJCF joint stiffness/damping exactly like Isaac Gym's
DOF_MODE_POS drives (reference ``humanoid.py:305-308``), with armature added
to the mass-matrix diagonal.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.ops import quat as rot
from ase_tpu.ops import spatial as sp
from ase_tpu.physics import model as M

_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class State(NamedTuple):
    """Physics state of one environment (leading batch dims added via vmap)."""

    root_pos: jnp.ndarray    # (3,)
    root_quat: jnp.ndarray   # (4,) xyzw
    joint_q: jnp.ndarray     # (n_sph, 4) spherical joint local quats
    hinge_q: jnp.ndarray     # (n_hinge,)
    u: jnp.ndarray           # (nv,) [root lin(3) ang(3) | joint dofs | props 6k]
    prop_pos: jnp.ndarray    # (np, 3)
    prop_quat: jnp.ndarray   # (np, 4)


def sph_ids(model: M.Model):
    return [b for b in range(model.nb) if model.jtype[b] == M.SPHERICAL]


def hinge_ids(model: M.Model):
    return [b for b in range(model.nb) if model.jtype[b] == M.REVOLUTE]


def default_state(model: M.Model) -> State:
    n_sph = len(sph_ids(model))
    n_hinge = len(hinge_ids(model))
    return State(
        root_pos=jnp.zeros(3),
        root_quat=rot.quat_identity(()),
        joint_q=rot.quat_identity((n_sph,)),
        hinge_q=jnp.zeros((n_hinge,)),
        u=jnp.zeros(model.nv),
        prop_pos=jnp.zeros((model.num_props, 3)),
        prop_quat=rot.quat_identity((model.num_props,)),
    )


# ---------------------------------------------------------------------------
# dof <-> joint-state views (Isaac tensor API parity: dof_pos / dof_vel)
# ---------------------------------------------------------------------------

def dof_pos(model: M.Model, state: State) -> jnp.ndarray:
    """(nd,) exp-map coords for spherical joints, angles for hinges.

    Semantics match reference motion_lib.py:296-324 / humanoid dof tensors.
    """
    s_ids = sph_ids(model)
    pieces = []
    for j, b in enumerate(model.dof_body_ids):
        if model.jtype[b] == M.SPHERICAL:
            pieces.append(rot.quat_to_exp_map(state.joint_q[s_ids.index(b)]))
        else:
            h = hinge_ids(model).index(b)
            pieces.append(state.hinge_q[h][None])
    return jnp.concatenate(pieces)


def dof_vel(model: M.Model, state: State) -> jnp.ndarray:
    return state.u[model.root_dofs : model.nu]


def set_dof_state(model: M.Model, state: State, dof_p: jnp.ndarray, dof_v: jnp.ndarray) -> State:
    s_ids, h_ids = sph_ids(model), hinge_ids(model)
    joint_q = state.joint_q
    hinge_q = state.hinge_q
    for j, b in enumerate(model.dof_body_ids):
        off = model.dof_offsets[j]
        if model.jtype[b] == M.SPHERICAL:
            joint_q = joint_q.at[s_ids.index(b)].set(rot.exp_map_to_quat(dof_p[off : off + 3]))
        else:
            hinge_q = hinge_q.at[h_ids.index(b)].set(dof_p[off])
    u = state.u.at[model.root_dofs : model.nu].set(dof_v)
    return state._replace(joint_q=joint_q, hinge_q=hinge_q, u=u)


def set_root_state(state: State, pos, quat, lin_vel, ang_vel) -> State:
    u = state.u.at[0:3].set(lin_vel).at[3:6].set(ang_vel)
    return state._replace(root_pos=pos, root_quat=quat, u=u)


def has_free_root(model: M.Model) -> bool:
    return model.jtype[0] == M.FREE


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------

class Kin(NamedTuple):
    body_R: jnp.ndarray     # (nb, 3, 3) world rotations
    body_pos: jnp.ndarray   # (nb, 3) body origin world positions
    body_quat: jnp.ndarray  # (nb, 4)
    body_vel: jnp.ndarray   # (nb, 6) [w, v_origin] world frame
    com_world: jnp.ndarray  # (nb, 3)


def local_joint_quat(model: M.Model, state: State, b: int) -> jnp.ndarray:
    jt = model.jtype[b]
    if jt == M.FREE:
        jq = state.root_quat
    elif jt == M.SPHERICAL:
        jq = state.joint_q[sph_ids(model).index(b)]
    elif jt == M.REVOLUTE:
        h = hinge_ids(model).index(b)
        jq = rot.quat_from_angle_axis(state.hinge_q[h], model.joint_axis[b])
    else:
        jq = rot.quat_identity(())
    return rot.quat_mul(model.body_iquat[b], jq)


def fk(model: M.Model, state: State) -> Kin:
    nb = model.nb
    quats, Rs, ps = [], [], []
    for b in range(nb):
        lq = local_joint_quat(model, state, b)
        p = model.parents[b]
        if p == -1:
            quats.append(lq)
            if model.jtype[b] == M.FREE:
                ps.append(state.root_pos)
            else:
                # fixed base: anchored at its MJCF placement (+ optional offset)
                ps.append(state.root_pos + model.body_ipos[b])
        else:
            quats.append(rot.quat_mul(quats[p], lq))
            ps.append(ps[p] + rot.quat_rotate(quats[p], model.body_ipos[b]))
        Rs.append(rot.quat_to_rotation_matrix(quats[b]))

    # velocity FK: spatial velocity of each body at its own origin (world axes)
    vels = [None] * nb
    for b in range(nb):
        p = model.parents[b]
        if p == -1:
            if model.jtype[b] == M.FREE:
                w = state.u[3:6]
                v = state.u[0:3]
            else:
                w = jnp.zeros(3)
                v = jnp.zeros(3)
        else:
            wp = vels[p][0:3]
            vp = vels[p][3:6]
            v = vp + jnp.cross(wp, ps[b] - ps[p])
            off = model.dof_offset[b]
            if model.jtype[b] == M.SPHERICAL:
                w = wp + _einsum("ij,j->i", Rs[b], state.u[off : off + 3])
            elif model.jtype[b] == M.REVOLUTE:
                w = wp + _einsum("ij,j->i", Rs[b], model.joint_axis[b]) * state.u[off]
            else:
                w = wp
        vels[b] = jnp.concatenate([w, v])

    R = jnp.stack(Rs)
    pos = jnp.stack(ps)
    com_w = pos + _einsum("bij,bj->bi", R, model.com[: nb])
    return Kin(R, pos, jnp.stack(quats), jnp.stack(vels), com_w)


def ancestor_mask(model: M.Model) -> np.ndarray:
    """Static (nb, nu) mask: A[b, d] = 1 if dof d is on the path to body b."""
    A = np.zeros((model.nb, model.nu), dtype=np.float32)
    for b in range(model.nb):
        cur = b
        while cur != -1:
            jt = model.jtype[cur]
            off = model.dof_offset[cur]
            if jt == M.FREE:
                A[b, off : off + 6] = 1.0
            elif jt == M.SPHERICAL:
                A[b, off : off + 3] = 1.0
            elif jt == M.REVOLUTE:
                A[b, off] = 1.0
            cur = model.parents[cur]
    return A


def motion_subspace(model: M.Model, kin: Kin, origin: jnp.ndarray):
    """Φ (nu, 6) world-frame dof axes at reference point `origin`, and Φ̇ u.

    Returns (Phi, Phi_dot) where Phi_dot columns are the time-derivatives
    (each column already multiplied by nothing — raw d/dt of the axis).
    """
    cols = []
    dcols = []
    root_v = kin.body_vel[0]

    for b in range(model.nb):
        jt = model.jtype[b]
        off = model.dof_offset[b]
        p_b = kin.body_pos[b]
        # body spatial velocity at `origin`
        w_b = kin.body_vel[b][0:3]
        v_b_at_o = kin.body_vel[b][3:6] + jnp.cross(w_b, origin - p_b)
        v_sp = jnp.concatenate([w_b, v_b_at_o])
        if jt == M.FREE:
            # linear dofs: world axes, constant
            for k in range(3):
                e = jnp.zeros(3).at[k].set(1.0)
                cols.append(jnp.concatenate([jnp.zeros(3), e]))
                dcols.append(jnp.zeros(6))
            # angular dofs: world axes through the (moving) root point
            vlin = root_v[3:6]
            for k in range(3):
                e = jnp.zeros(3).at[k].set(1.0)
                cols.append(jnp.concatenate([e, jnp.cross(e, origin - p_b)]))
                dcols.append(jnp.concatenate([jnp.zeros(3), jnp.cross(e, -vlin)]))
        elif jt == M.SPHERICAL:
            for k in range(3):
                a = kin.body_R[b][:, k]
                phi = jnp.concatenate([a, jnp.cross(a, origin - p_b)])
                cols.append(phi)
                dcols.append(sp.motion_cross(v_sp, phi))
        elif jt == M.REVOLUTE:
            a = _einsum("ij,j->i", kin.body_R[b], model.joint_axis[b])
            phi = jnp.concatenate([a, jnp.cross(a, origin - p_b)])
            cols.append(phi)
            dcols.append(sp.motion_cross(v_sp, phi))
    return jnp.stack(cols), jnp.stack(dcols)


class DynOut(NamedTuple):
    Mmat: jnp.ndarray     # (nu, nu) LHS incl. armature + dt*kd (SPD)
    bias: jnp.ndarray     # (nu,) C(q,v) + g
    Phi: jnp.ndarray      # (nu, 6)
    Amask: jnp.ndarray    # (nb, nu)


def dof_body(model: M.Model) -> np.ndarray:
    """Static (nu,) map dof index -> owning body."""
    out = np.zeros(model.nu, dtype=np.int32)
    for b in range(model.nb):
        jt = model.jtype[b]
        off = model.dof_offset[b]
        n = {M.FREE: 6, M.SPHERICAL: 3, M.REVOLUTE: 1}.get(jt, 0)
        out[off : off + n] = b
    return out


def _crba_masks(model: M.Model):
    """Static masks for the composite-inertia mass-matrix assembly."""
    A = ancestor_mask(model)           # (nb, nu)
    db = dof_body(model)               # (nu,)
    W = A[db]                          # (nu, nu): W[d,e]=1 iff dof e on path to body(d)
    both = W * W.T                     # same-joint-body pairs (counted twice below)
    # subtree mask: S[p, b] = 1 iff p is an ancestor-or-self of b
    nb = model.nb
    S = np.zeros((nb, nb), dtype=np.float32)
    for b in range(nb):
        cur = b
        while cur != -1:
            S[cur, b] = 1.0
            cur = model.parents[cur]
    return A, W, both, S


def compute_dynamics(model: M.Model, state: State, kin: Kin, dt: float) -> DynOut:
    origin = state.root_pos
    A_np, W_np, both_np, S_np = _crba_masks(model)
    A = jnp.asarray(A_np)
    Phi, Phid = motion_subspace(model, kin, origin)

    u_art = state.u[: model.nu]

    # spatial inertias at origin
    nb = model.nb
    I_com_w = _einsum(
        "bij,bjk,blk->bil", kin.body_R, model.inertia[:nb], kin.body_R
    )
    I_sp = sp.spatial_inertia(model.mass[:nb], kin.com_world - origin[None, :], I_com_w)

    # composite rigid-body inertias (all expressed at the common origin, so
    # subtree composition is a masked sum — the CRBA trick without transforms)
    Ic = _einsum("pb,bkl->pkl", jnp.asarray(S_np), I_sp)

    # M[d,e] = φ_d^T Ic[body(d)] φ_e for e on the path to body(d); symmetric.
    db = jnp.asarray(dof_body(model))
    F = _einsum("dkl,dl->dk", Ic[db], Phi)         # (nu, 6)
    G = _einsum("dk,ek->de", F, Phi)               # (nu, nu)
    W = jnp.asarray(W_np)
    both = jnp.asarray(both_np)
    Mmat = W * G + (W * G).T - both * G

    # bias accelerations & forces
    phiu = Phid * u_art[:, None]                   # (nu, 6)
    a_bias = _einsum("bd,dk->bk", A, phiu)         # (nb, 6)
    v_sp = _einsum("bd,dk->bk", A, Phi * u_art[:, None])

    Iv = _einsum("bkl,bl->bk", I_sp, v_sp)
    f_vel = sp.force_cross(v_sp, Iv)
    f_bias = _einsum("bkl,bl->bk", I_sp, a_bias) + f_vel

    # gravity as an external spatial force at origin
    Fg = model.mass[:nb, None] * model.gravity[None, :]
    tau_g = jnp.cross(kin.com_world - origin[None, :], Fg)
    f_grav = jnp.concatenate([tau_g, Fg], axis=-1)

    f_total = f_bias - f_grav
    Fd = _einsum("bd,bk->dk", A, f_total)
    bias = jnp.sum(Phi * Fd, axis=-1)

    # armature + SPD implicit damping on the diagonal (articulation dofs only)
    rd = model.root_dofs
    diag = jnp.zeros(model.nu)
    diag = diag.at[rd:].add(model.armature + dt * model.damping)
    if rd == 6:
        # root angular damping (asset option angular_damping=0.01)
        diag = diag.at[3:6].add(dt * model.ang_damping)
    Mmat = Mmat + jnp.diag(diag)

    return DynOut(Mmat, bias, Phi, A)


def pd_torques(
    model: M.Model, state: State, pd_target: jnp.ndarray, dt: float,
    kd_scale=1.0,
) -> jnp.ndarray:
    """Stable-PD joint torques (nd,) from exp-map/angle targets.

    SPD (Tan et al.): tau = -kp (q + dt q̇ - q̄) - kd q̇, with dt·kd moved into
    the mass-matrix diagonal by compute_dynamics.

    ``kd_scale`` is a per-env domain-randomization multiplier on the velocity
    gain (reference base_task.py dof_properties.damping randomization); the
    matching implicit-damping diagonal scale lives in dynamics2.
    """
    kp, kd = model.stiffness, model.damping * kd_scale
    qd = dof_vel(model, state)
    s_ids = sph_ids(model)
    taus = []
    for j, b in enumerate(model.dof_body_ids):
        off = model.dof_offsets[j]
        if model.jtype[b] == M.SPHERICAL:
            q_cur = state.joint_q[s_ids.index(b)]
            q_tar = rot.exp_map_to_quat(pd_target[off : off + 3])
            err = rot.quat_to_exp_map(rot.quat_mul(rot.quat_conjugate(q_cur), q_tar))
            w_loc = qd[off : off + 3]
            tau = kp[off : off + 3] * (err - dt * w_loc) - kd[off : off + 3] * w_loc
            taus.append(tau)
        else:
            q_cur = state.hinge_q[hinge_ids(model).index(b)]
            e = pd_target[off] - q_cur
            tau = kp[off] * (e - dt * qd[off]) - kd[off] * qd[off]
            taus.append(tau[None])
    return jnp.concatenate(taus)


def limit_torques(model: M.Model, state: State, k_limit: float = 200.0) -> jnp.ndarray:
    """Soft joint-limit penalty torques on the dof view."""
    q = dof_pos(model, state)
    qd = dof_vel(model, state)
    over = jnp.maximum(q - model.dof_limit_hi, 0.0)
    under = jnp.maximum(model.dof_limit_lo - q, 0.0)
    in_violation = (over > 0) | (under > 0)
    damp = jnp.where(in_violation, 2.0 * jnp.sqrt(k_limit), 0.0)
    return -k_limit * over + k_limit * under - damp * qd * in_violation


# -- joint-batched actuation (TPU kernel-count optimization) ------------------
#
# The single-env functions above loop over joints in Python; under vmap each
# joint contributes its own chain of small (B, 3) kernels per substep. The
# *_batched versions below process all spherical joints as one (B, S, ...)
# tensor and all hinges as one (B, H) tensor — identical math, a fraction of
# the dispatches. Equivalence is asserted in tests/test_physics.py.

_DOF_TABLE_CACHE: dict = {}


def _dof_tables(model: M.Model):
    """Static gather/scatter tables mapping stacked-joint tensors onto the
    (nd,) dof view: (sph_rows S, sph_cols 3S, hinge_rows H, hinge_cols H).
    Keyed on the model's static joint topology (arrays are unhashable)."""
    key = (model.jtype, model.dof_body_ids, model.dof_offsets)
    cached = _DOF_TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    s_ids, h_ids = sph_ids(model), hinge_ids(model)
    sph_rows, sph_cols, hin_rows, hin_cols = [], [], [], []
    for j, b in enumerate(model.dof_body_ids):
        off = model.dof_offsets[j]
        if model.jtype[b] == M.SPHERICAL:
            sph_rows.append(s_ids.index(b))
            sph_cols.extend([off, off + 1, off + 2])
        else:
            hin_rows.append(h_ids.index(b))
            hin_cols.append(off)
    out = (np.asarray(sph_rows), np.asarray(sph_cols),
           np.asarray(hin_rows), np.asarray(hin_cols))
    _DOF_TABLE_CACHE[key] = out
    return out


def dof_pos_batched(model: M.Model, states: State) -> jnp.ndarray:
    """(B, nd) dof positions for a batched State (see dof_pos)."""
    sph_rows, sph_cols, hin_rows, hin_cols = _dof_tables(model)
    B = states.root_pos.shape[0]
    out = jnp.zeros((B, model.nd))
    if len(sph_rows):
        exp = rot.quat_to_exp_map(states.joint_q[:, sph_rows])      # (B, S, 3)
        out = out.at[:, sph_cols].set(exp.reshape(B, -1))
    if len(hin_rows):
        out = out.at[:, hin_cols].set(states.hinge_q[:, hin_rows])
    return out


def pd_torques_batched(model: M.Model, states: State, pd_target: jnp.ndarray,
                       dt: float, kd_scale=None) -> jnp.ndarray:
    """(B, nd) Stable-PD torques for a batched State (see pd_torques).

    ``kd_scale`` is a damping-DR multiplier: per-env (B,) or per-actuated-dof
    (B, nd) (reference dof_properties.damping randomization samples every dof
    independently, base_task.py:332-386)."""
    sph_rows, sph_cols, hin_rows, hin_cols = _dof_tables(model)
    B = pd_target.shape[0]
    kp, kd = model.stiffness, model.damping
    qd = states.u[:, model.root_dofs : model.nu]                    # (B, nd)
    if kd_scale is not None and kd_scale.ndim == 1:
        ks = jnp.broadcast_to(kd_scale[:, None], (B, model.nd))
    else:
        ks = kd_scale                                               # (B, nd) | None
    out = jnp.zeros((B, model.nd))
    if len(sph_rows):
        q_cur = states.joint_q[:, sph_rows]                         # (B, S, 4)
        q_tar = rot.exp_map_to_quat(pd_target[:, sph_cols].reshape(B, -1, 3))
        err = rot.quat_to_exp_map(
            rot.quat_mul(rot.quat_conjugate(q_cur), q_tar))
        w_loc = qd[:, sph_cols].reshape(B, -1, 3)
        kp_s = kp[sph_cols].reshape(-1, 3)
        kd_s = kd[sph_cols].reshape(-1, 3)
        ks3 = ks[:, sph_cols].reshape(B, -1, 3) if ks is not None else 1.0
        tau_s = kp_s * (err - dt * w_loc) - kd_s * ks3 * w_loc
        out = out.at[:, sph_cols].set(tau_s.reshape(B, -1))
    if len(hin_rows):
        e = pd_target[:, hin_cols] - states.hinge_q[:, hin_rows]
        ksh = ks[:, hin_cols] if ks is not None else 1.0
        tau_h = (kp[hin_cols] * (e - dt * qd[:, hin_cols])
                 - kd[hin_cols] * ksh * qd[:, hin_cols])
        out = out.at[:, hin_cols].set(tau_h)
    return out


def limit_torques_batched(model: M.Model, states: State,
                          k_limit: float = 200.0) -> jnp.ndarray:
    """(B, nd) soft joint-limit torques for a batched State."""
    q = dof_pos_batched(model, states)
    qd = states.u[:, model.root_dofs : model.nu]
    over = jnp.maximum(q - model.dof_limit_hi, 0.0)
    under = jnp.maximum(model.dof_limit_lo - q, 0.0)
    in_violation = (over > 0) | (under > 0)
    damp = jnp.where(in_violation, 2.0 * jnp.sqrt(k_limit), 0.0)
    return -k_limit * over + k_limit * under - damp * qd * in_violation
