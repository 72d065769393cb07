"""HumanoidViewMotion: kinematic motion playback through the env stack.

Capability-parity with reference ``ase/env/tasks/humanoid_view_motion.py``:
each env plays back one clip (env i plays clip i mod M, advancing by num_envs
on each wraparound), the physics state is overwritten from the motion library
every step (with zeroed velocities), self-collision is disabled, and episodes
reset when the clip ends. This is the de-facto integration test for retargeted
motion data (SURVEY §4).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ase_tpu.envs.humanoid import EnvState
from ase_tpu.envs.humanoid_amp import HumanoidAMP
from ase_tpu.motion import motion_lib as ml


class HumanoidViewMotion(HumanoidAMP):
    def __init__(self, cfg, headless: bool = True):
        cfg = copy.deepcopy(cfg)
        control_freq_inv = cfg["env"]["controlFrequencyInv"]
        sim_dt = float(cfg.get("sim", {}).get("dt", 1.0 / 60.0))
        self._motion_dt = control_freq_inv * sim_dt
        cfg["env"]["controlFrequencyInv"] = 1
        cfg["env"]["pdControl"] = False
        cfg["env"]["enableSelfCollision"] = False  # reference col_filter=1
        super().__init__(cfg, headless=headless)

    def _initial_aux(self, B: int) -> Dict[str, Any]:
        aux = super()._initial_aux(B)
        num_motions = self._motion_lib.num_motions
        # offset by -B: the construction-time full reset advances ids by B,
        # landing the first playback on clips [0..B) (reference behavior)
        aux["motion_ids"] = jnp.remainder(
            jnp.arange(B, dtype=jnp.int32) - B, num_motions
        )
        return aux

    def pre_physics_step(self, state, actions):
        # kinematic playback: zero torques (reference 30-35)
        return state.replace(actions=actions), jnp.zeros_like(actions)

    def post_physics_step(self, state: EnvState) -> EnvState:
        state = super().post_physics_step(state)
        return self._motion_sync(state)

    def _motion_sync(self, state: EnvState) -> EnvState:
        motion_ids = state.aux["motion_ids"]
        motion_times = state.progress.astype(jnp.float32) * self._motion_dt
        ms = ml.get_motion_state(self._motion_lib, motion_ids, motion_times)
        for k in ("root_vel", "root_ang_vel", "dof_vel"):
            ms[k] = jnp.zeros_like(ms[k])
        phys = self._ref_state_phys(ms)
        state = state.replace(phys=phys)
        return self._refresh_kinematics(state)

    def _compute_reset(self, state: EnvState) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lengths = self._motion_lib.lengths[state.aux["motion_ids"]]
        motion_times = state.progress.astype(jnp.float32) * self._motion_dt
        reset = (motion_times > lengths).astype(jnp.int32)
        return reset, jnp.zeros_like(reset)

    def _reset_actors(self, state: EnvState, mask) -> Tuple[EnvState, jnp.ndarray]:
        # advance to the next block of clips on reset (reference 88-97)
        num_motions = self._motion_lib.num_motions
        aux = dict(state.aux)
        aux["motion_ids"] = jnp.where(
            mask,
            jnp.remainder(aux["motion_ids"] + self.num_envs, num_motions),
            aux["motion_ids"],
        )
        aux["reset_ref_mask"] = jnp.zeros(mask.shape[0], bool)
        return state.replace(aux=aux), mask
