"""HumanoidStrike task: knock over a physical target block with the sword.

Capability-parity with reference ``ase/env/tasks/humanoid_strike.py``: a free
box prop (0.4×0.4×1.8, density 30) spawned near/far, 15-dim task obs (local
target pos/rot6d/vel/angvel), reward = 0.6·tip-over + 0.4·approach-velocity
with the success override, and the custom termination that punishes
non-strike-body contact with the target (``humanoid_strike.py:218-294``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.envs import obs as obs_kernels
from ase_tpu.envs.humanoid import EnvState
from ase_tpu.envs.humanoid_amp_task import HumanoidAMPTask
from ase_tpu.ops import quat as rot
from ase_tpu.physics import mjcf


class HumanoidStrike(HumanoidAMPTask):
    def __init__(self, cfg, headless: bool = True):
        super().__init__(cfg, headless=headless)
        self._tar_dist_min = 0.5
        self._tar_dist_max = 10.0
        self._near_dist = 1.5
        self._near_prob = 0.5
        strike_body_names = cfg["env"]["strikeBodyNames"]
        self._strike_body_ids = jnp.asarray(
            [self.model.body_index(b) for b in strike_body_names], dtype=jnp.int32
        )

    def _build_model(self, asset_path: str):
        model = mjcf.load_mjcf(asset_path)
        # strike_target.urdf: 0.4 x 0.4 x 1.8 box, asset density 30
        target = mjcf.box_prop([0.2, 0.2, 0.9], density=30.0)
        return mjcf.add_props(model, [target])

    def get_task_obs_size(self) -> int:
        return 15 if self._enable_task_obs else 0

    def _initial_aux(self, B: int) -> Dict[str, Any]:
        aux = super()._initial_aux(B)
        aux["prev_root_pos"] = jnp.zeros((B, 3))
        aux["successes"] = jnp.zeros(B)
        return aux

    def post_physics_step(self, state: EnvState) -> EnvState:
        state = super().post_physics_step(state)
        # publish per-env success (target knocked over — same cos(tilt) < 0.2
        # condition as the reward's success override) for the agent's
        # consecutive-success meters (reference run.py:66-97 RLGPUAlgoObserver
        # consumes infos['successes'] at done indices)
        _, tar_rot, _, _ = self._target_states(state)
        up = jnp.zeros((state.obs.shape[0], 3)).at[:, 2].set(1.0)
        tar_up = rot.quat_rotate(tar_rot, up)
        succ = jnp.sum(up * tar_up, axis=-1) < 0.2
        aux = dict(state.aux)
        aux["successes"] = succ.astype(jnp.float32)
        return state.replace(aux=aux)

    # -- target placement (reference humanoid_strike.py:107-129) ---------------

    def _reset_actors(self, state: EnvState, mask) -> Tuple[EnvState, jnp.ndarray]:
        new_state, mask = super()._reset_actors(state, mask)
        B = mask.shape[0]
        new_state, keys = self.split_rng(new_state, 3)

        near = jax.random.uniform(keys[0], (B,)) < self._near_prob
        dist_max = jnp.where(near, self._near_dist, self._tar_dist_max)
        rand_dist = (
            (dist_max - self._tar_dist_min) * jax.random.uniform(keys[1], (B,))
            + self._tar_dist_min
        )
        k2a, k2b = jax.random.split(keys[2])
        theta = 2 * jnp.pi * jax.random.uniform(k2a, (B,))
        root_xy = new_state.phys.root_pos[:, 0:2]
        tar_xy = root_xy + jnp.stack(
            [rand_dist * jnp.cos(theta), rand_dist * jnp.sin(theta)], -1
        )
        tar_pos = jnp.concatenate([tar_xy, jnp.full((B, 1), 0.9)], axis=-1)
        rot_theta = 2 * jnp.pi * jax.random.uniform(k2b, (B,))
        axis = jnp.array([0.0, 0.0, 1.0])
        tar_rot = rot.quat_from_angle_axis(rot_theta, jnp.tile(axis, (B, 1)))

        phys = new_state.phys
        prop_pos = phys.prop_pos.at[:, 0].set(tar_pos)
        prop_quat = phys.prop_quat.at[:, 0].set(tar_rot)
        u = phys.u.at[:, self.model.nu : self.model.nu + 6].set(0.0)
        return new_state.replace(
            phys=phys._replace(prop_pos=prop_pos, prop_quat=prop_quat, u=u)
        ), mask

    # -- stepping ---------------------------------------------------------------

    def _update_task(self, state: EnvState) -> EnvState:
        aux = dict(state.aux)
        aux["prev_root_pos"] = state.body_pos[:, 0, :]
        return state.replace(aux=aux)

    def _target_states(self, state: EnvState):
        pos = state.phys.prop_pos[:, 0]
        quat = state.phys.prop_quat[:, 0]
        vel = state.phys.u[:, self.model.nu : self.model.nu + 3]
        ang = state.phys.u[:, self.model.nu + 3 : self.model.nu + 6]
        return pos, quat, vel, ang

    def _compute_task_obs(self, state: EnvState) -> jnp.ndarray:
        """Reference humanoid_strike.py:193-216."""
        root_pos = state.body_pos[:, 0, :]
        root_rot = state.body_quat[:, 0, :]
        tar_pos, tar_rot, tar_vel, tar_ang = self._target_states(state)

        heading_rot = rot.calc_heading_quat_inv(root_rot)
        local_tar_pos = tar_pos - root_pos
        local_tar_pos = local_tar_pos.at[:, 2].set(tar_pos[:, 2])
        local_tar_pos = rot.quat_rotate(heading_rot, local_tar_pos)
        local_tar_vel = rot.quat_rotate(heading_rot, tar_vel)
        local_tar_ang = rot.quat_rotate(heading_rot, tar_ang)
        local_tar_rot = rot.quat_mul(heading_rot, tar_rot)
        local_tar_rot6 = rot.quat_to_tan_norm(local_tar_rot)
        return jnp.concatenate(
            [local_tar_pos, local_tar_rot6, local_tar_vel, local_tar_ang], axis=-1
        )

    def _compute_reward(self, state: EnvState) -> jnp.ndarray:
        """Reference humanoid_strike.py:218-251."""
        tar_speed = 1.0
        vel_err_scale = 4.0
        tar_rot_w, vel_reward_w = 0.6, 0.4

        tar_pos, tar_rot, _, _ = self._target_states(state)
        root_pos = state.body_pos[:, 0, :]
        prev = state.aux["prev_root_pos"]

        up = jnp.zeros_like(tar_pos).at[:, 2].set(1.0)
        tar_up = rot.quat_rotate(tar_rot, up)
        tar_rot_err = jnp.sum(up * tar_up, axis=-1)
        tar_rot_r = jnp.maximum(1.0 - tar_rot_err, 0.0)

        tar_dir = tar_pos[:, 0:2] - root_pos[:, 0:2]
        tar_dir = tar_dir / jnp.maximum(
            jnp.linalg.norm(tar_dir, axis=-1, keepdims=True), 1e-8
        )
        root_vel = (root_pos - prev) / self.dt
        tar_dir_speed = jnp.sum(tar_dir * root_vel[:, :2], axis=-1)
        tar_vel_err = jnp.maximum(tar_speed - tar_dir_speed, 0.0)
        vel_reward = jnp.exp(-vel_err_scale * tar_vel_err**2)
        vel_reward = jnp.where(tar_dir_speed <= 0, 0.0, vel_reward)

        reward = tar_rot_w * tar_rot_r + vel_reward_w * vel_reward
        succ = tar_rot_err < 0.2
        return jnp.where(succ, 1.0, reward)

    def _compute_reset(self, state: EnvState):
        """Reference humanoid_strike.py:254-294 (target-contact failure)."""
        reset, term = super()._compute_reset(state)
        if not self._enable_early_termination:
            return reset, term
        contact_force_threshold = 1.0
        nb = self.model.nb
        tar_forces = state.contact_forces[:, nb, :]
        tar_has_contact = jnp.any(
            jnp.abs(tar_forces[:, 0:2]) > contact_force_threshold, axis=-1
        )
        contact_mask = jnp.ones((nb,), bool).at[self._contact_body_ids].set(False)
        contact_mask = contact_mask.at[self._strike_body_ids].set(False)
        nonstrike = state.contact_forces[:, :nb] * contact_mask[None, :, None]
        nonstrike_contact = jnp.any(
            jnp.abs(nonstrike) > contact_force_threshold, axis=(-2, -1)
        )
        tar_fail = tar_has_contact & nonstrike_contact & (state.progress > 1)
        term = jnp.where(tar_fail, 1, term)
        reset = jnp.where(tar_fail, 1, reset)
        return reset, term
