"""The simulation engine: a single pure `step` fused over substeps.

TPU-native replacement for the reference's per-step PhysX calls
(``gym.set_dof_position_target_tensor`` → ``gym.simulate`` ×substeps →
``refresh_*_tensor``; reference ``ase/env/tasks/humanoid.py:417-444`` and
``base_task.py:403-407``). One call advances a whole environment one control
step (control_freq_inv × substeps solver ticks) and returns the refreshed
body-state views (root states, dof states, rigid-body states, net contact
forces) exactly mirroring the Isaac Gym tensor API so the env layer maps 1:1.

Batching: every function is written for a single env and vmapped here; under
`jit` the full (rollout × control × substep) loop nests into one XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ase_tpu.ops import quat as rot
from ase_tpu.physics import collision2, dynamics, solver
from ase_tpu.physics import model as M
from ase_tpu.physics.dynamics import State

_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class SimConfig(NamedTuple):
    dt: float = 1.0 / 60.0             # control-rate-independent sim dt (SIM_TIMESTEP)
    substeps: int = 2
    solver: solver.SolverConfig = solver.SolverConfig()
    max_contacts: int = 24
    enable_self_collision: bool = True
    torque_control: bool = False       # False = PD position drives
    power_scale: float = 1.0
    limit_stiffness: float = 200.0


class StepOut(NamedTuple):
    state: State
    body_pos: jnp.ndarray        # (nb, 3)
    body_quat: jnp.ndarray       # (nb, 4)
    body_vel: jnp.ndarray        # (nb, 3) linear, world
    body_ang_vel: jnp.ndarray    # (nb, 3) world
    contact_forces: jnp.ndarray  # (nb + np, 3)


def _substep(model: M.Model, cfg: SimConfig, tables, state: State, action: jnp.ndarray):
    h = cfg.dt / cfg.substeps

    kin = dynamics.fk(model, state)
    dyn = dynamics.compute_dynamics(model, state, kin, h)

    # actuation
    if cfg.torque_control:
        tau = action * model.motor_gear * cfg.power_scale
    else:
        tau = dynamics.pd_torques(model, state, action, h)
    tau = tau + dynamics.limit_torques(model, state, cfg.limit_stiffness)
    tau_full = jnp.zeros(model.nu).at[6:].set(tau)

    qdd = jax.scipy.linalg.cho_solve((dyn.chol, True), tau_full - dyn.bias)
    u_art = state.u[: model.nu] + h * qdd

    # free props: gravity + gyroscopic terms
    prop_R = rot.quat_to_rotation_matrix(state.prop_quat)
    u_props = []
    for k in range(model.num_props):
        blk = state.u[model.nu + 6 * k : model.nu + 6 * k + 6]
        v = blk[0:3] + h * model.gravity
        I_w = _einsum("ij,jk,lk->il", prop_R[k], model.inertia[model.nb + k], prop_R[k])
        w = blk[3:6]
        wdot = jnp.linalg.solve(I_w, -jnp.cross(w, I_w @ w))
        w = (w + h * wdot) / (1.0 + h * model.ang_damping)
        u_props.append(jnp.concatenate([v, w]))
    u_free = jnp.concatenate([u_art] + u_props) if u_props else u_art

    # contacts
    contacts = collision2.detect(
        model, tables, kin.body_R, kin.body_pos, prop_R, state.prop_pos, cfg.max_contacts
    )
    J = solver.contact_jacobian(
        model, contacts, dyn.Phi, dyn.Amask, state.root_pos, state.prop_pos
    )
    minv = solver.make_minv_apply(model, dyn.chol, prop_R)
    u_new, lam, body_forces = solver.solve(
        model, contacts, J, minv, u_free, h, cfg.solver
    )

    # clamp angular velocities (asset option max_angular_velocity)
    def clamp_w(w):
        n = jnp.linalg.norm(w) + 1e-9
        return w * jnp.minimum(1.0, model.max_ang_vel / n)

    u_new = u_new.at[3:6].set(clamp_w(u_new[3:6]))

    # integrate positions (semi-implicit Euler with new velocities)
    root_pos = state.root_pos + h * u_new[0:3]
    root_quat = rot.quat_integrate(state.root_quat, u_new[3:6], h)

    s_ids = dynamics.sph_ids(model)
    joint_q = state.joint_q
    for i, b in enumerate(s_ids):
        off = model.dof_offset[b]
        joint_q = joint_q.at[i].set(
            rot.quat_integrate_local(joint_q[i], u_new[off : off + 3], h)
        )
    h_ids = dynamics.hinge_ids(model)
    hinge_q = state.hinge_q
    for i, b in enumerate(h_ids):
        off = model.dof_offset[b]
        hinge_q = hinge_q.at[i].add(h * u_new[off])

    prop_pos = state.prop_pos
    prop_quat = state.prop_quat
    for k in range(model.num_props):
        off = model.nu + 6 * k
        w = clamp_w(u_new[off + 3 : off + 6])
        u_new = u_new.at[off + 3 : off + 6].set(w)
        prop_pos = prop_pos.at[k].add(h * u_new[off : off + 3])
        prop_quat = prop_quat.at[k].set(rot.quat_integrate(prop_quat[k], w, h))

    new_state = State(
        root_pos=root_pos,
        root_quat=root_quat,
        joint_q=joint_q,
        hinge_q=hinge_q,
        u=u_new,
        prop_pos=prop_pos,
        prop_quat=prop_quat,
    )
    return new_state, body_forces


def step(model: M.Model, cfg: SimConfig, tables, state: State, action: jnp.ndarray) -> StepOut:
    """Advance one sim tick (cfg.substeps solver substeps), single env."""

    def body(carry, _):
        st, _ = carry
        st, forces = _substep(model, cfg, tables, st, action)
        return (st, forces), None

    init_forces = jnp.zeros((model.nb + model.num_props, 3))
    (state, forces), _ = jax.lax.scan(
        body, (state, init_forces), None, length=cfg.substeps
    )

    kin = dynamics.fk(model, state)
    body_vel = kin.body_vel[:, 3:6]
    body_ang_vel = kin.body_vel[:, 0:3]
    return StepOut(
        state=state,
        body_pos=kin.body_pos,
        body_quat=kin.body_quat,
        body_vel=body_vel,
        body_ang_vel=body_ang_vel,
        contact_forces=forces,
    )


def make_batched_step(model: M.Model, cfg: SimConfig):
    """vmapped step: (state_batch, action (B, nd)) -> StepOut batch."""
    tables = collision2.build_tables(model, cfg.enable_self_collision)
    f = partial(step, model, cfg, tables)
    return jax.vmap(f)


def batch_default_state(model: M.Model, batch: int) -> State:
    one = dynamics.default_state(model)
    return jax.tree_util.tree_map(lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), one)
