"""HumanoidReach task: point a body (the sword) at a 3D target.

Capability-parity with reference ``ase/env/tasks/humanoid_reach.py``:
3-dim heading-local target obs, reward = exp(-4·‖Δ‖²)
(``humanoid_reach.py:184-195``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ase_tpu.envs.humanoid import EnvState
from ase_tpu.envs.humanoid_amp_task import HumanoidAMPTask
from ase_tpu.ops import quat as rot


class HumanoidReach(HumanoidAMPTask):
    def __init__(self, cfg, headless: bool = True):
        env_cfg = cfg["env"]
        self._tar_speed = float(env_cfg["tarSpeed"])
        self._tar_change_steps_min = int(env_cfg["tarChangeStepsMin"])
        self._tar_change_steps_max = int(env_cfg["tarChangeStepsMax"])
        self._tar_dist_max = float(env_cfg["tarDistMax"])
        self._tar_height_min = float(env_cfg["tarHeightMin"])
        self._tar_height_max = float(env_cfg["tarHeightMax"])
        self._reach_body_name = env_cfg["reachBodyName"]
        super().__init__(cfg, headless=headless)
        self._reach_body_id = self.model.body_index(self._reach_body_name)

    def get_task_obs_size(self) -> int:
        return 3 if self._enable_task_obs else 0

    def _initial_aux(self, B: int) -> Dict[str, Any]:
        aux = super()._initial_aux(B)
        aux["tar_pos"] = jnp.zeros((B, 3))
        aux["tar_change_steps"] = jnp.zeros(B, jnp.int32)
        return aux

    def _resample_goal(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        B = mask.shape[0]
        state, keys = self.split_rng(state, 2)
        r = jax.random.uniform(keys[0], (B, 3))
        xy = self._tar_dist_max * (2.0 * r[:, 0:2] - 1.0)
        z = (self._tar_height_max - self._tar_height_min) * r[:, 2:3] + self._tar_height_min
        pos = jnp.concatenate([xy, z], axis=-1)
        change = jax.random.randint(
            keys[1], (B,), self._tar_change_steps_min, self._tar_change_steps_max
        )
        aux = dict(state.aux)
        aux["tar_pos"] = jnp.where(mask[:, None], pos, aux["tar_pos"])
        aux["tar_change_steps"] = jnp.where(
            mask, state.progress + change, aux["tar_change_steps"]
        )
        return state.replace(aux=aux)

    def _update_task(self, state: EnvState) -> EnvState:
        mask = state.progress >= state.aux["tar_change_steps"]
        return self._resample_goal(state, mask)

    def _reset_task(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        return self._resample_goal(state, mask)

    def _compute_task_obs(self, state: EnvState) -> jnp.ndarray:
        """Reference humanoid_reach.py:169-178 (absolute target in heading frame)."""
        root_rot = state.body_quat[:, 0, :]
        heading_rot = rot.calc_heading_quat_inv(root_rot)
        return rot.quat_rotate(heading_rot, state.aux["tar_pos"])

    def _compute_reward(self, state: EnvState) -> jnp.ndarray:
        pos_err_scale = 4.0
        reach_pos = state.body_pos[:, self._reach_body_id, :]
        diff = state.aux["tar_pos"] - reach_pos
        pos_err = jnp.sum(diff * diff, axis=-1)
        return jnp.exp(-pos_err_scale * pos_err)
