"""Gym-style vectorized env adapter (reference ``ase/env/tasks/vec_task.py`` /
``vec_task_wrappers.py`` + the rl_games RLGPUEnv shim in ``run.py:100-148``).

The native interface of this framework is the functional
``reset_done/step`` API; this adapter wraps it in the familiar stateful
``step(actions) -> (obs, rew, done, info)`` shape with clipped obs/actions
and ``get_env_info`` metadata (action_space / observation_space /
amp_observation_space), for integration with external RL loops.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class BoxSpace(NamedTuple):
    """Minimal gym.spaces.Box stand-in (gym isn't a dependency)."""

    low: np.ndarray
    high: np.ndarray

    @property
    def shape(self):
        return self.low.shape


class VecEnv:
    """Stateful adapter over a functional task env."""

    def __init__(self, task, clip_obs: float = np.inf, clip_actions: float = 1.0,
                 rng: Optional[jnp.ndarray] = None):
        self.task = task
        self.clip_obs = clip_obs
        self.clip_actions = clip_actions
        self._state = task.initial_state(
            rng if rng is not None else jax.random.PRNGKey(0)
        )
        self._step = jax.jit(task.step)
        self._reset_done = jax.jit(task.reset_done)

    # -- rl_games-style interface ---------------------------------------------

    def step(self, actions):
        actions = jnp.clip(jnp.asarray(actions), -self.clip_actions, self.clip_actions)
        self._state = self._step(self._state, actions)
        s = self._state
        obs = jnp.clip(s.obs, -self.clip_obs, self.clip_obs)
        info: Dict[str, Any] = {"terminate": s.terminate_buf}
        if hasattr(self.task, "amp_obs_flat"):
            info["amp_obs"] = self.task.amp_obs_flat(s)
        return obs, s.rew, s.reset_buf, info

    def reset(self, env_ids=None):
        """Partial reset: env_ids=None resets everything (reference
        vec_task_wrappers.py:17-33 semantics)."""
        if env_ids is None:
            mask = jnp.ones(self.task.num_envs, jnp.int32)
        else:
            mask = jnp.zeros(self.task.num_envs, jnp.int32).at[jnp.asarray(env_ids)].set(1)
        self._state = self._reset_done(self._state.replace(reset_buf=mask))
        return jnp.clip(self._state.obs, -self.clip_obs, self.clip_obs)

    def fetch_amp_obs_demo(self, num_samples: int):
        self._state, keys = self.task.split_rng(self._state, 1)
        return self.task.fetch_amp_obs_demo(keys[0], num_samples)

    def get_env_info(self) -> Dict[str, Any]:
        na, no = self.task.get_action_size(), self.task.get_obs_size()
        info = {
            "action_space": BoxSpace(-np.ones(na, np.float32), np.ones(na, np.float32)),
            "observation_space": BoxSpace(
                np.full(no, -np.inf, np.float32), np.full(no, np.inf, np.float32)
            ),
        }
        amp = self.task.amp_obs_size()
        if amp:
            info["amp_observation_space"] = BoxSpace(
                np.full(amp, -np.inf, np.float32), np.full(amp, np.inf, np.float32)
            )
        return info

    @property
    def state(self):
        return self._state
