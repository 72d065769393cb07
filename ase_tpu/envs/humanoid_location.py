"""HumanoidLocation task: walk to a target 2D position.

Capability-parity with reference ``ase/env/tasks/humanoid_location.py``:
2-dim local target obs, reward = 0.5·position + 0.4·velocity + 0.1·facing with
the near-target override (``humanoid_location.py:184-227``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ase_tpu.envs.humanoid import EnvState
from ase_tpu.envs.humanoid_amp_task import HumanoidAMPTask
from ase_tpu.ops import quat as rot


class HumanoidLocation(HumanoidAMPTask):
    def __init__(self, cfg, headless: bool = True):
        env_cfg = cfg["env"]
        self._tar_speed = float(env_cfg["tarSpeed"])
        self._tar_change_steps_min = int(env_cfg["tarChangeStepsMin"])
        self._tar_change_steps_max = int(env_cfg["tarChangeStepsMax"])
        self._tar_dist_max = float(env_cfg["tarDistMax"])
        super().__init__(cfg, headless=headless)

    def get_task_obs_size(self) -> int:
        return 2 if self._enable_task_obs else 0

    def _initial_aux(self, B: int) -> Dict[str, Any]:
        aux = super()._initial_aux(B)
        aux["tar_pos"] = jnp.zeros((B, 2))
        aux["tar_change_steps"] = jnp.zeros(B, jnp.int32)
        aux["prev_root_pos"] = jnp.zeros((B, 3))
        return aux

    def _resample_goal(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        B = mask.shape[0]
        state, keys = self.split_rng(state, 2)
        rand = self._tar_dist_max * (
            2.0 * jax.random.uniform(keys[0], (B, 2)) - 1.0
        )
        char_pos = state.body_pos[:, 0, 0:2]
        change = jax.random.randint(
            keys[1], (B,), self._tar_change_steps_min, self._tar_change_steps_max
        )
        aux = dict(state.aux)
        aux["tar_pos"] = jnp.where(mask[:, None], char_pos + rand, aux["tar_pos"])
        aux["tar_change_steps"] = jnp.where(
            mask, state.progress + change, aux["tar_change_steps"]
        )
        return state.replace(aux=aux)

    def _update_task(self, state: EnvState) -> EnvState:
        mask = state.progress >= state.aux["tar_change_steps"]
        state = self._resample_goal(state, mask)
        aux = dict(state.aux)
        aux["prev_root_pos"] = state.body_pos[:, 0, :]
        return state.replace(aux=aux)

    def _reset_task(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        return self._resample_goal(state, mask)

    def _compute_task_obs(self, state: EnvState) -> jnp.ndarray:
        root_pos = state.body_pos[:, 0, :]
        root_rot = state.body_quat[:, 0, :]
        tar3d = jnp.concatenate(
            [state.aux["tar_pos"], jnp.zeros_like(state.aux["tar_pos"][:, :1])], -1
        )
        heading_rot = rot.calc_heading_quat_inv(root_rot)
        local_tar = rot.quat_rotate(heading_rot, tar3d - root_pos)[:, 0:2]
        return local_tar

    def _compute_reward(self, state: EnvState) -> jnp.ndarray:
        dist_threshold = 0.5
        pos_err_scale = 0.5
        vel_err_scale = 4.0
        pos_reward_w, vel_reward_w, face_reward_w = 0.5, 0.4, 0.1

        root_pos = state.body_pos[:, 0, :]
        root_rot = state.body_quat[:, 0, :]
        tar_pos = state.aux["tar_pos"]
        prev = state.aux["prev_root_pos"]

        pos_diff = tar_pos - root_pos[:, 0:2]
        pos_err = jnp.sum(pos_diff * pos_diff, axis=-1)
        pos_reward = jnp.exp(-pos_err_scale * pos_err)

        tar_dir = pos_diff / jnp.maximum(
            jnp.linalg.norm(pos_diff, axis=-1, keepdims=True), 1e-8
        )
        root_vel = (root_pos - prev) / self.dt
        tar_dir_speed = jnp.sum(tar_dir * root_vel[:, :2], axis=-1)
        tar_vel_err = jnp.maximum(self._tar_speed - tar_dir_speed, 0.0)
        vel_reward = jnp.exp(-vel_err_scale * tar_vel_err**2)
        vel_reward = jnp.where(tar_dir_speed <= 0, 0.0, vel_reward)

        heading_rot = rot.calc_heading_quat(root_rot)
        facing_dir = jnp.zeros_like(root_pos).at[:, 0].set(1.0)
        facing_dir = rot.quat_rotate(heading_rot, facing_dir)
        facing_err = jnp.sum(tar_dir * facing_dir[:, 0:2], axis=-1)
        facing_reward = jnp.maximum(facing_err, 0.0)

        near = pos_err < dist_threshold
        facing_reward = jnp.where(near, 1.0, facing_reward)
        vel_reward = jnp.where(near, 1.0, vel_reward)

        return (
            pos_reward_w * pos_reward
            + vel_reward_w * vel_reward
            + face_reward_w * facing_reward
        )
