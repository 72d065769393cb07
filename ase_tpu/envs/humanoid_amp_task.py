"""HumanoidAMPTask: base for goal-conditioned AMP tasks.

Capability-parity with reference ``ase/env/tasks/humanoid_amp_task.py``:
task observations concatenated onto the humanoid obs, per-task goal update /
resample hooks, task reset composed with env reset.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ase_tpu.envs.humanoid import EnvState
from ase_tpu.envs.humanoid_amp import HumanoidAMP


class HumanoidAMPTask(HumanoidAMP):
    def __init__(self, cfg, headless: bool = True):
        self._enable_task_obs = bool(cfg["env"]["enableTaskObs"])
        super().__init__(cfg, headless=headless)

    def get_obs_size(self) -> int:
        obs_size = super().get_obs_size()
        if self._enable_task_obs:
            obs_size += self.get_task_obs_size()
        return obs_size

    def get_task_obs_size(self) -> int:
        return 0

    # hooks ------------------------------------------------------------------

    def _update_task(self, state: EnvState) -> EnvState:
        return state

    def _reset_task(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        return state

    # overrides ---------------------------------------------------------------

    def pre_physics_step(self, state, actions):
        state, tgt = super().pre_physics_step(state, actions)
        state = self._update_task(state)
        return state, tgt

    def _reset_envs(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        state = super()._reset_envs(state, mask)
        state = self._reset_task(state, mask)
        # task obs may depend on freshly reset goals; recompute obs for mask
        obs = self._compute_observations(state)
        return state.replace(obs=jnp.where(mask[:, None], obs, state.obs))

    def _compute_observations(self, state: EnvState) -> jnp.ndarray:
        humanoid_obs = self._compute_humanoid_obs(state)
        if self._enable_task_obs:
            task_obs = self._compute_task_obs(state)
            return jnp.concatenate([humanoid_obs, task_obs], axis=-1)
        return humanoid_obs

    def _compute_task_obs(self, state: EnvState) -> jnp.ndarray:
        raise NotImplementedError
