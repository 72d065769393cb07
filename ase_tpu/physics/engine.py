"""The simulation engine: a single pure batched `step` fused over substeps.

TPU-native replacement for the reference's per-step PhysX calls
(``gym.set_dof_position_target_tensor`` → ``gym.simulate`` ×substeps →
``refresh_*_tensor``; reference ``ase/env/tasks/humanoid.py:417-444`` and
``base_task.py:403-407``). One call advances a whole batch of environments one
sim tick and returns the refreshed body-state views (root states, dof states,
rigid-body states, net contact forces) mirroring the Isaac Gym tensor API so
the env layer maps 1:1.

Performance-critical structure: per-env logic (FK, dynamics assembly,
collision, Jacobians, the contact iteration) is vmapped, but the dense linear
algebra — Cholesky factorization of the joint-space inertia and the
triangular solves — runs as NATIVE batched lax ops at the top level
(vmapping ``cho_factor`` lowers to a path ~65x slower than the batched
primitive, measured on TPU v5e).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ase_tpu.ops import linalg3, pallas_chol
from ase_tpu.ops import quat as rot
from ase_tpu.physics import (
    collision2,
    collision3,
    dynamics,
    dynamics2,
    solver,
    solver2,
)
from ase_tpu.physics import model as M
from ase_tpu.physics.dynamics import State

_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _fk(model, states, actor_scale=None):
    """Batched FK: component-form (envs dense in lanes) by default; the
    vmapped per-body tree walk stays behind ASE_TPU_FK_AOS=1 for A/B
    (the AoS oracle predates the actor-scale DR knob and ignores it)."""
    if os.environ.get("ASE_TPU_FK_AOS", "0") == "1" and actor_scale is None:
        return jax.vmap(lambda s: dynamics.fk(model, s))(states)
    return dynamics2.fk_batched(model, states, actor_scale=actor_scale)


class SimConfig(NamedTuple):
    dt: float = 1.0 / 60.0             # SIM_TIMESTEP (reference config.py:12)
    substeps: int = 2
    solver: solver.SolverConfig = solver.SolverConfig()
    max_contacts: int = 24
    enable_self_collision: bool = True
    torque_control: bool = False       # False = PD position drives
    power_scale: float = 1.0
    limit_stiffness: float = 200.0
    max_dof_vel: float = 64.0          # PhysX maxJointVelocity default; also
                                       # keeps explicit Coriolis terms stable
                                       # (dt*w must stay << 1)


class StepOut(NamedTuple):
    state: State                 # batched
    body_pos: jnp.ndarray        # (B, nb, 3)
    body_quat: jnp.ndarray       # (B, nb, 4)
    body_vel: jnp.ndarray        # (B, nb, 3) linear, world
    body_ang_vel: jnp.ndarray    # (B, nb, 3) world
    contact_forces: jnp.ndarray  # (B, nb + np, 3)
    dof_forces: jnp.ndarray      # (B, nd) applied actuation+limit torques
                                 # (Isaac acquire_dof_force_tensor parity,
                                 #  reference humanoid.py force-sensor setup)
    kin: "dynamics.Kin" = None   # FK of `state` — feed back as `kin0` on the
                                 # next tick to skip the redundant re-FK


def _chol_batched(Mb: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky of many small SPD matrices, batch-last layout.

    ``lax.linalg.cholesky`` on (B, n, n) with n≈37 runs its blocked update
    over tiles padded to (8, 128) in the *matrix* dims — ~18 ms at B=4096.
    Unrolling the right-looking factorization over columns with the batch in
    the lane dim touches only (n-k, B) panels per step: ~3.5 ms, max err 4e-7
    (measured, TPU v5e). Falls back to lax for large n or tiny batches.
    """
    B, n = Mb.shape[0], Mb.shape[-1]
    if n > 64 or B < 64 or os.environ.get("ASE_TPU_LAX_CHOL", "0") == "1":
        return jax.lax.linalg.cholesky(Mb, symmetrize_input=False)
    A = jnp.transpose(Mb, (1, 2, 0))                    # (n, n, B)
    return _chol_batch_last(A)


def _chol_from_batch_last(A: jnp.ndarray) -> jnp.ndarray:
    """Factor a batch-last (n, n, B) SPD stack; returns L as (B, n, n).

    Applies the same fallbacks as `_chol_batched` (lax cholesky for n>64 or
    B<64, and the ASE_TPU_LAX_CHOL escape hatch) so the flag and the tiny-
    batch path work on the production substep too.
    """
    n, B = A.shape[0], A.shape[-1]
    if n > 64 or B < 64 or os.environ.get("ASE_TPU_LAX_CHOL", "0") == "1":
        return jax.lax.linalg.cholesky(
            jnp.transpose(A, (2, 0, 1)), symmetrize_input=False
        )
    return _chol_batch_last(A)


def _chol_batch_last(A: jnp.ndarray) -> jnp.ndarray:
    """Right-looking Cholesky on (n, n, B); returns L as (B, n, n)."""
    n = A.shape[0]
    for k in range(n):
        d = jnp.sqrt(A[k, k])
        col = A[k + 1 :, k] / d
        A = A.at[k, k].set(d)
        A = A.at[k + 1 :, k].set(col)
        A = A.at[k + 1 :, k + 1 :].add(-col[:, None, :] * col[None, :, :])
    return jnp.tril(jnp.transpose(A, (2, 0, 1)))


def _chol_solve_batched(L: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = rhs for batched L (B,n,n), rhs (B,n,m)."""
    y = jax.lax.linalg.triangular_solve(
        L, rhs, left_side=True, lower=True, transpose_a=False
    )
    return jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )


def _detect_contacts(model: M.Model, cfg: SimConfig, tables, states: State,
                     kin, friction_scale, actor_scale=None):
    """Narrow phase + active-contact selection for the current pose.

    Called ONCE per sim tick (not per substep): PhysX TGS likewise runs one
    narrow phase per 60 Hz step and iterates its substeps/position iterations
    against that persistent contact set (reference sim params
    ``substeps: 2, solver_type TGS`` — cfg/humanoid_sword_shield.yaml:31-42).
    ASE_TPU_COLLISION_PER_SUBSTEP=1 restores per-substep redetection for A/B.
    """
    prop_R = rot.quat_to_rotation_matrix(states.prop_quat)
    margin = cfg.solver.contact_offset
    per_body_fs = friction_scale.ndim == 2      # (B, nb+np) per-shape DR
    if getattr(tables, "soa", None) is not None and os.environ.get(
        "ASE_TPU_COLLISION_AOS", "0"
    ) != "1":
        contacts = collision3.detect_batched(
            model, tables.soa, kin.body_quat, kin.body_pos, states.prop_quat,
            states.prop_pos, cfg.max_contacts, margin=margin,
            friction_scale=friction_scale if per_body_fs else None,
            actor_scale=actor_scale,
        )
        if per_body_fs:
            return contacts
    else:
        contacts = jax.vmap(
            lambda bR, bp, pR, pp: collision2.detect(
                model, tables, bR, bp, pR, pp, cfg.max_contacts, margin=margin
            )
        )(kin.body_R, kin.body_pos, prop_R, states.prop_pos)
        if per_body_fs:
            # AoS parity oracle: coarsen per-body DR to its per-env mean
            friction_scale = jnp.mean(friction_scale, axis=1)
    return contacts._replace(friction=contacts.friction * friction_scale[:, None])


def _substep_batched(model: M.Model, cfg: SimConfig, tables, states: State,
                     actions: jnp.ndarray, friction_scale, gain_scale,
                     mass_scale=None, gravity_scale=None, damping_scale=None,
                     restitution=None, actor_scale=None, kin=None,
                     contacts=None):
    h = cfg.dt / cfg.substeps
    nu = model.nu
    Bn = actions.shape[0]

    if kin is None:
        kin = _fk(model, states, actor_scale=actor_scale)
    if os.environ.get("ASE_TPU_DYNAMICS_AOS", "0") == "1" and actor_scale is None:
        dyn_ref = jax.vmap(
            lambda s, k: dynamics.compute_dynamics(model, s, k, h)
        )(states, kin)
        M_bl = jnp.transpose(dyn_ref.Mmat, (1, 2, 0))
        bias, Phi = dyn_ref.bias, dyn_ref.Phi
        if mass_scale is not None:
            # A/B debug path: post-hoc scaling also touches the armature
            # diagonal (negligible vs body inertias); the default batch-last
            # path scales exactly (pre-armature, inside dynamics2). Per-body
            # DR coarsens to its per-env mean here.
            ms = mass_scale if mass_scale.ndim == 1 else jnp.mean(mass_scale, axis=1)
            M_bl = M_bl * ms[None, None, :]
            bias = bias * ms[:, None]
    else:
        M_bl, bias, Phi = dynamics2.compute_dynamics_batch_last(
            model, states, kin, h,
            mass_scale=mass_scale, gravity_scale=gravity_scale,
            damping_scale=damping_scale, actor_scale=actor_scale,
        )
    Amask = jnp.asarray(dynamics.ancestor_mask(model))

    # actuation: joint-batched Stable-PD + limit torques (the vmapped
    # per-joint loops are kept behind ASE_TPU_PD_AOS=1 for A/B validation —
    # they emit a small-kernel chain per joint per substep)
    pd_aos = os.environ.get("ASE_TPU_PD_AOS", "0") == "1"
    if cfg.torque_control:
        tau = actions * model.motor_gear[None, :] * cfg.power_scale
    elif pd_aos and damping_scale is not None:
        tau = jax.vmap(
            lambda s, a, ks: dynamics.pd_torques(model, s, a, h, kd_scale=ks)
        )(states, actions, damping_scale)
    elif pd_aos:
        tau = jax.vmap(lambda s, a: dynamics.pd_torques(model, s, a, h))(states, actions)
    else:
        tau = dynamics.pd_torques_batched(
            model, states, actions, h, kd_scale=damping_scale)
    if pd_aos:
        limit = jax.vmap(
            lambda s: dynamics.limit_torques(model, s, cfg.limit_stiffness)
        )(states)
    else:
        limit = dynamics.limit_torques_batched(model, states, cfg.limit_stiffness)
    # stiffness DR: per-env (B,) or per-actuated-dof (B, nd)
    gs = gain_scale[:, None] if gain_scale.ndim == 1 else gain_scale
    tau = tau * gs + limit
    tau_full = jnp.zeros((Bn, nu)).at[:, model.root_dofs :].set(tau)

    # free props: gravity + gyroscopic terms (batched closed form)
    prop_R = rot.quat_to_rotation_matrix(states.prop_quat)   # (B, np, 3, 3)
    if model.num_props > 0:
        blk = states.u[:, nu:].reshape(Bn, model.num_props, 6)
        # gravity DR applies to the whole sim (reference randomizes
        # sim_params.gravity), so free props scale too
        if gravity_scale is not None:
            v = blk[..., 0:3] + h * model.gravity * gravity_scale[:, None, None]
        else:
            v = blk[..., 0:3] + h * model.gravity
        I_w = _einsum(
            "bpij,pjk,bplk->bpil", prop_R, model.inertia[model.nb :], prop_R
        )
        w = blk[..., 3:6]
        Iww = _einsum("bpij,bpj->bpi", I_w, w)
        wdot = linalg3.solve3(I_w, -jnp.cross(w, Iww))
        w = (w + h * wdot) / (1.0 + h * model.ang_damping)
        u_free_prop = jnp.concatenate([v, w], axis=-1).reshape(Bn, -1)
    else:
        u_free_prop = None

    # contacts: detected once per tick by the caller (PhysX-TGS cadence,
    # see _detect_contacts); recomputed here only when None (single-substep
    # callers / per-substep A/B mode)
    if contacts is None:
        contacts = _detect_contacts(
            model, cfg, tables, states, kin, friction_scale,
            actor_scale=actor_scale)

    use_cg = (
        cfg.solver.scheme == "jacobi"
        and os.environ.get("ASE_TPU_CONTACT_AOS", "0") != "1"
    )
    if use_cg:
        # component-grouped Z-form pipeline. Key identity: with Z = L^{-1}J^T
        # the Delassus operator is A = Z^T Z and the free contact velocity is
        # J u_free = J u + h Z^T y0 (y0 = L^{-1}(tau - bias)) — so the whole
        # contact solve needs ONE forward triangular solve up front and ONE
        # m=1 backward solve at the end (u_new = u + L^{-T}(h y0 + Z lam)),
        # instead of full two-sided solves for qdd and W. Factor + forward
        # substitution run fused in a single VMEM-resident Pallas kernel
        # (ops/pallas_chol.py) on TPU.
        JT_bl, JT_prop = solver2.contact_jacobian_t_bl(
            model, contacts, Phi, Amask, states.root_pos, states.prop_pos
        )                                                   # (nu, 3K, B), (B, 6np, 3K)
        nc3 = JT_bl.shape[1]
        # the (nu, 3K, B) Jacobian block and the single tau-bias column go in
        # as SEPARATE right-hand sides: pre-concatenating them cost a
        # measured ~0.3 ms/tick layout copy, and the split keeps the big
        # operand (8,128)-tile-aligned in the kernel's VMEM block
        L_bl, Z, y0 = pallas_chol.chol_forward(
            M_bl, JT_bl, (tau_full - bias).T[:, None, :])
        y0 = y0[:, 0, :]                                               # (nu, B)

        # Delassus A = ZᵀZ. When the Jacobi iteration runs its matvec in
        # bf16 (cfg.solver.matvec_bf16 — A's ONLY consumer), feed the einsum
        # bf16 operands and emit bf16 directly: the f32-HIGHEST version
        # lowered to a convolution fusion reading 130 MB/substep (~0.36 ms)
        # plus a 44 MB operand relayout; halving the operand bytes roughly
        # halves both. MXU accumulation stays f32 internally.
        bf16_delassus = cfg.solver.matvec_bf16 and os.environ.get(
            "ASE_TPU_F32_DELASSUS", "0") != "1"
        if bf16_delassus:
            Z16 = Z.astype(jnp.bfloat16)
            A = jnp.einsum(
                "vib,vjb->bij", Z16, Z16,
                preferred_element_type=jnp.bfloat16,
            )
        else:
            A = _einsum("vib,vjb->bij", Z, Z)
        v_art_cur = _einsum("vib,bv->bi", JT_bl, states.u[:, :nu])
        v0f = v_art_cur + h * _einsum("vib,vb->bi", Z, y0)
        if model.num_props > 0:
            Jp = JT_prop.reshape(Bn, model.num_props, 6, -1)
            lin = Jp[:, :, 0:3, :] / model.mass[None, model.nb :, None, None]
            I_w_inv = linalg3.inv3(I_w)
            ang = _einsum("bpij,bpjm->bpim", I_w_inv, Jp[:, :, 3:6, :])
            W_prop = jnp.concatenate([lin, ang], axis=2).reshape(Bn, -1, nc3)
            A = A + _einsum("bvi,bvj->bij", JT_prop, W_prop).astype(A.dtype)
            v0f = v0f + _einsum("bvi,bv->bi", JT_prop, u_free_prop)

        if restitution is not None:
            # pre-solve normal contact velocities for the Newton bounce
            # target (only materialized when the restitution DR knob is on)
            vn_pre = v_art_cur
            if model.num_props > 0:
                vn_pre = vn_pre + _einsum(
                    "bvi,bv->bi", JT_prop, states.u[:, nu:])
            vn_pre = vn_pre[:, : nc3 // 3]
            lam_f = solver2.jacobi_lambda(
                contacts, A, v0f, h, cfg.solver,
                restitution=restitution, vn_pre=vn_pre,
            )
        else:
            lam_f = solver2.jacobi_lambda(contacts, A, v0f, h, cfg.solver)

        du_bl = (h * y0 + _einsum("vib,bi->vb", Z, lam_f))[:, None, :]  # (nu,1,B)
        u_art_new = states.u[:, :nu] + pallas_chol.back_solve(L_bl, du_bl)[:, 0, :].T
        if model.num_props > 0:
            u_prop_new = u_free_prop + _einsum("bvj,bj->bv", W_prop, lam_f)
            u_new = jnp.concatenate([u_art_new, u_prop_new], axis=-1)
        else:
            u_new = u_art_new
        body_forces = solver2.body_forces_from_lambda(
            model, contacts, lam_f, h,
            contact_offset=cfg.solver.contact_offset)
    else:
        # AoS A/B validation path: classic two-sided solves (qdd, then W)
        L = _chol_from_batch_last(M_bl)
        qdd = _chol_solve_batched(L, (tau_full - bias)[..., None])[..., 0]
        u_art = states.u[:, :nu] + h * qdd
        u_free = (
            jnp.concatenate([u_art, u_free_prop], axis=-1)
            if model.num_props > 0 else u_art
        )

        J = jax.vmap(
            lambda c, phi, o, pp: solver.contact_jacobian(model, c, phi, Amask, o, pp)
        )(contacts, Phi, states.root_pos, states.prop_pos)

        # W = M^{-1} J^T : batched triangular solves for the articulation
        # block, closed-form 3x3 inverses for the prop blocks
        K = J.shape[1]  # actual contact budget (<= cfg.max_contacts)
        Jf = J.reshape(Bn, K * 3, model.nv)
        W_art = _chol_solve_batched(L, jnp.swapaxes(Jf[..., :nu], 1, 2))
        if model.num_props > 0:
            Jp = jnp.swapaxes(Jf[..., nu:], 1, 2).reshape(Bn, model.num_props, 6, K * 3)
            lin = Jp[:, :, 0:3, :] / model.mass[None, model.nb :, None, None]
            I_w_inv = linalg3.inv3(I_w)                                # (B, np, 3, 3)
            ang = _einsum("bpij,bpjm->bpim", I_w_inv, Jp[:, :, 3:6, :])
            W_prop = jnp.concatenate([lin, ang], axis=2).reshape(Bn, -1, K * 3)
            W = jnp.concatenate([W_art, W_prop], axis=1)               # (B, nv, 3K)
        else:
            W = W_art

        u_new, lam, body_forces = solver.solve_batched(
            model, contacts, J, W, u_free, h, cfg.solver
        )

    # clamp angular velocities (asset option max_angular_velocity)
    def clamp_w(w):
        n = jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-9
        return w * jnp.minimum(1.0, model.max_ang_vel / n)

    # clamp joint dof rates (PhysX maxJointVelocity parity + integrator safety)
    u_new = u_new.at[:, model.root_dofs : nu].set(
        jnp.clip(u_new[:, model.root_dofs : nu], -cfg.max_dof_vel, cfg.max_dof_vel)
    )

    if model.root_dofs == 6:
        u_new = u_new.at[:, 3:6].set(clamp_w(u_new[:, 3:6]))
        # integrate root pose (semi-implicit Euler with new velocities)
        root_pos = states.root_pos + h * u_new[:, 0:3]
        root_quat = rot.quat_integrate(states.root_quat, u_new[:, 3:6], h)
    else:
        root_pos = states.root_pos
        root_quat = states.root_quat

    s_ids = dynamics.sph_ids(model)
    if s_ids:
        w_loc = jnp.stack(
            [u_new[:, model.dof_offset[b] : model.dof_offset[b] + 3] for b in s_ids],
            axis=1,
        )
        joint_q = rot.quat_integrate_local(states.joint_q, w_loc, h)
    else:
        joint_q = states.joint_q
    h_ids = dynamics.hinge_ids(model)
    if h_ids:
        h_offs = jnp.asarray([model.dof_offset[b] for b in h_ids])
        hinge_q = states.hinge_q + h * u_new[:, h_offs]
    else:
        hinge_q = states.hinge_q

    prop_pos = states.prop_pos
    prop_quat = states.prop_quat
    if model.num_props > 0:
        blk = u_new[:, nu:].reshape(Bn, model.num_props, 6)
        wp = clamp_w(blk[..., 3:6])
        u_new = u_new.at[:, nu:].set(
            jnp.concatenate([blk[..., 0:3], wp], axis=-1).reshape(Bn, -1)
        )
        prop_pos = prop_pos + h * blk[..., 0:3]
        prop_quat = rot.quat_integrate(prop_quat, wp, h)

    new_states = State(
        root_pos=root_pos, root_quat=root_quat, joint_q=joint_q,
        hinge_q=hinge_q, u=u_new, prop_pos=prop_pos, prop_quat=prop_quat,
    )
    return new_states, body_forces, tau


def step_batched(model: M.Model, cfg: SimConfig, tables, states: State,
                 actions: jnp.ndarray, friction_scale=None, gain_scale=None,
                 mass_scale=None, gravity_scale=None, damping_scale=None,
                 restitution=None, actor_scale=None, kin0=None) -> StepOut:
    """Advance one sim tick (cfg.substeps solver substeps), batched envs.

    friction/gain/mass/gravity/damping_scale and restitution are per-env
    domain-randomization knobs (reference base_task.py:306-386
    apply_randomizations: rigid_shape friction/restitution, dof
    stiffness/damping, rigid_body mass, sim gravity). ``actor_scale`` is the
    whole-actor geometric scale (reference gym.set_actor_scale,
    base_task.py:346-355): link offsets and humanoid geom sizes x s, mass
    x s^3, rotational inertia x s^5; ``kin0`` passed in must come from the
    same-scaled FK.

    ``kin0`` is an optional precomputed FK of ``states`` (e.g. the ``kin``
    field of the previous tick's StepOut); passing it skips one full-batch
    FK per tick. FK otherwise runs once per substep — at the end, on the new
    state — so the last substep's FK doubles as the output refresh."""
    B = actions.shape[0]
    if friction_scale is None:
        friction_scale = jnp.ones(B)
    if gain_scale is None:
        gain_scale = jnp.ones(B)

    kin = kin0 if kin0 is not None else _fk(model, states, actor_scale=actor_scale)
    # ONE narrow phase per tick at the pre-tick pose (PhysX-TGS cadence:
    # substeps iterate against a persistent contact set); per-substep
    # redetection behind ASE_TPU_COLLISION_PER_SUBSTEP=1 for A/B
    per_substep = os.environ.get("ASE_TPU_COLLISION_PER_SUBSTEP", "0") == "1"
    contacts0 = None if per_substep else _detect_contacts(
        model, cfg, tables, states, kin, friction_scale,
        actor_scale=actor_scale)

    def body(carry, _):
        st, kin, _, _ = carry
        st, forces, tau = _substep_batched(
            model, cfg, tables, st, actions, friction_scale, gain_scale,
            mass_scale=mass_scale, gravity_scale=gravity_scale,
            damping_scale=damping_scale, restitution=restitution,
            actor_scale=actor_scale, kin=kin, contacts=contacts0,
        )
        return (st, _fk(model, st, actor_scale=actor_scale), forces, tau), None

    init_forces = jnp.zeros((B, model.nb + model.num_props, 3))
    init_tau = jnp.zeros((B, model.nd))
    (states, kin, forces, dof_forces), _ = jax.lax.scan(
        body, (states, kin, init_forces, init_tau), None, length=cfg.substeps
    )

    return StepOut(
        state=states,
        body_pos=kin.body_pos,
        body_quat=kin.body_quat,
        body_vel=kin.body_vel[..., 3:6],
        body_ang_vel=kin.body_vel[..., 0:3],
        contact_forces=forces,
        dof_forces=dof_forces,
        kin=kin,
    )


# -- single-env compatibility wrapper ----------------------------------------

def step(model: M.Model, cfg: SimConfig, tables, state: State, action: jnp.ndarray,
         friction_scale=1.0, gain_scale=1.0) -> StepOut:
    """Single-env step (adds/removes a batch axis around step_batched)."""
    states = jax.tree_util.tree_map(lambda x: x[None], state)
    out = step_batched(
        model, cfg, tables, states, action[None],
        jnp.asarray(friction_scale)[None].reshape(1),
        jnp.asarray(gain_scale)[None].reshape(1),
    )
    return jax.tree_util.tree_map(lambda x: x[0], out)


def make_batched_step(model: M.Model, cfg: SimConfig):
    """(state_batch, action (B, nd)) -> StepOut batch."""
    tables = collision2.build_tables(model, cfg.enable_self_collision)
    return partial(step_batched, model, cfg, tables)


def batch_default_state(model: M.Model, batch: int) -> State:
    one = dynamics.default_state(model)
    return jax.tree_util.tree_map(lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), one)
