"""HumanoidHeading task: move in a target direction while facing another.

Capability-parity with reference ``ase/env/tasks/humanoid_heading.py``:
5-dim task obs (local target dir, target speed, local facing dir), reward =
0.7·direction + 0.3·facing (``humanoid_heading.py:250-285``), goals resampled
on a per-env step schedule.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ase_tpu.envs.humanoid import EnvState
from ase_tpu.envs.humanoid_amp_task import HumanoidAMPTask
from ase_tpu.ops import quat as rot


class HumanoidHeading(HumanoidAMPTask):
    def __init__(self, cfg, headless: bool = True):
        env_cfg = cfg["env"]
        self._tar_speed_min = float(env_cfg["tarSpeedMin"])
        self._tar_speed_max = float(env_cfg["tarSpeedMax"])
        self._heading_change_steps_min = int(env_cfg["headingChangeStepsMin"])
        self._heading_change_steps_max = int(env_cfg["headingChangeStepsMax"])
        self._enable_rand_heading = bool(env_cfg["enableRandHeading"])
        super().__init__(cfg, headless=headless)

    def get_task_obs_size(self) -> int:
        return 5 if self._enable_task_obs else 0

    def _initial_aux(self, B: int) -> Dict[str, Any]:
        aux = super()._initial_aux(B)
        aux["tar_dir"] = jnp.tile(jnp.array([1.0, 0.0]), (B, 1))
        aux["tar_facing_dir"] = jnp.tile(jnp.array([1.0, 0.0]), (B, 1))
        aux["tar_speed"] = jnp.ones(B)
        aux["heading_change_steps"] = jnp.zeros(B, jnp.int32)
        aux["prev_root_pos"] = jnp.zeros((B, 3))
        return aux

    def _resample_goal(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        B = mask.shape[0]
        state, keys = self.split_rng(state, 3)
        if self._enable_rand_heading:
            theta = jax.random.uniform(keys[0], (B,), minval=-jnp.pi, maxval=jnp.pi)
            face_theta = jax.random.uniform(keys[1], (B,), minval=-jnp.pi, maxval=jnp.pi)
        else:
            theta = jnp.zeros(B)
            face_theta = jnp.zeros(B)
        k2a, k2b = jax.random.split(keys[2])
        speed = jax.random.uniform(
            k2a, (B,), minval=self._tar_speed_min, maxval=self._tar_speed_max
        )
        change = jax.random.randint(
            k2b, (B,), self._heading_change_steps_min, self._heading_change_steps_max
        )
        aux = dict(state.aux)
        aux["tar_dir"] = jnp.where(
            mask[:, None], jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1), aux["tar_dir"]
        )
        aux["tar_facing_dir"] = jnp.where(
            mask[:, None],
            jnp.stack([jnp.cos(face_theta), jnp.sin(face_theta)], -1),
            aux["tar_facing_dir"],
        )
        aux["tar_speed"] = jnp.where(mask, speed, aux["tar_speed"])
        aux["heading_change_steps"] = jnp.where(
            mask, state.progress + change, aux["heading_change_steps"]
        )
        return state.replace(aux=aux)

    def _update_task(self, state: EnvState) -> EnvState:
        mask = state.progress >= state.aux["heading_change_steps"]
        state = self._resample_goal(state, mask)
        aux = dict(state.aux)
        aux["prev_root_pos"] = state.body_pos[:, 0, :]
        return state.replace(aux=aux)

    def _reset_task(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        return self._resample_goal(state, mask)

    def _compute_task_obs(self, state: EnvState) -> jnp.ndarray:
        """Reference humanoid_heading.py:233-249."""
        root_rot = state.body_quat[:, 0, :]
        heading_rot = rot.calc_heading_quat_inv(root_rot)
        tar_dir3d = jnp.concatenate(
            [state.aux["tar_dir"], jnp.zeros_like(state.aux["tar_dir"][:, :1])], -1
        )
        local_tar = rot.quat_rotate(heading_rot, tar_dir3d)[:, 0:2]
        face3d = jnp.concatenate(
            [state.aux["tar_facing_dir"], jnp.zeros_like(state.aux["tar_dir"][:, :1])], -1
        )
        local_face = rot.quat_rotate(heading_rot, face3d)[:, 0:2]
        return jnp.concatenate(
            [local_tar, state.aux["tar_speed"][:, None], local_face], axis=-1
        )

    def _compute_reward(self, state: EnvState) -> jnp.ndarray:
        """Reference humanoid_heading.py:250-285."""
        vel_err_scale = 0.25
        tangent_err_w = 0.1
        dir_reward_w = 0.7
        facing_reward_w = 0.3

        root_pos = state.body_pos[:, 0, :]
        prev = state.aux["prev_root_pos"]
        root_vel = (root_pos - prev) / self.dt
        tar_dir = state.aux["tar_dir"]
        tar_speed = state.aux["tar_speed"]

        tar_dir_speed = jnp.sum(tar_dir * root_vel[:, :2], axis=-1)
        tar_dir_vel = tar_dir_speed[:, None] * tar_dir
        tangent_vel = root_vel[:, :2] - tar_dir_vel
        tangent_speed = jnp.sum(tangent_vel, axis=-1)

        tar_vel_err = tar_speed - tar_dir_speed
        dir_reward = jnp.exp(
            -vel_err_scale
            * (tar_vel_err**2 + tangent_err_w * tangent_speed**2)
        )
        dir_reward = jnp.where(tar_dir_speed <= 0, 0.0, dir_reward)

        root_rot = state.body_quat[:, 0, :]
        heading_rot = rot.calc_heading_quat(root_rot)
        facing_dir = jnp.zeros_like(root_pos).at[:, 0].set(1.0)
        facing_dir = rot.quat_rotate(heading_rot, facing_dir)
        facing_err = jnp.sum(state.aux["tar_facing_dir"] * facing_dir[:, 0:2], -1)
        facing_reward = jnp.maximum(facing_err, 0.0)

        return dir_reward_w * dir_reward + facing_reward_w * facing_reward
