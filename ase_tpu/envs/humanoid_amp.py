"""HumanoidAMP env: AMP observation history + motion-library state init.

Capability-parity with reference ``ase/env/tasks/humanoid_amp.py``: the
rolling ``numAMPObsSteps`` window of per-step AMP features, demo observation
fetches from the motion library, and Reference State Initialization
(Default/Start/Random/Hybrid). Resets — including the motion-state gathers —
run inside jit as masked merges, so RSI happens on-device mid-rollout
(reference does indexed writes + host-side branching,
``humanoid_amp.py:132-201``).
"""

from __future__ import annotations

import enum
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ase_tpu.envs import obs as obs_kernels
from ase_tpu.envs.humanoid import EnvState, Humanoid
from ase_tpu.motion import motion_lib as ml
from ase_tpu.ops import quat as rot
from ase_tpu.physics import dynamics


class StateInit(enum.Enum):
    Default = 0
    Start = 1
    Random = 2
    Hybrid = 3


class HumanoidAMP(Humanoid):
    def __init__(self, cfg, headless: bool = True):
        env_cfg = cfg["env"]
        self._state_init = StateInit[env_cfg["stateInit"]]
        self._hybrid_init_prob = float(env_cfg.get("hybridInitProb", 0.5))
        self._num_amp_obs_steps = int(env_cfg["numAMPObsSteps"])
        assert self._num_amp_obs_steps >= 2

        super().__init__(cfg, headless=headless)

        self._num_amp_obs_per_step = (
            13 + 6 * (len(self.model.dof_offsets) - 1) + self.model.nd
            + 3 * len(env_cfg["keyBodies"])
        )

        motion_file = env_cfg["motion_file"]
        self._load_motion(motion_file)

    # -- sizes ---------------------------------------------------------------

    def get_num_amp_obs(self) -> int:
        return self._num_amp_obs_steps * self._num_amp_obs_per_step

    def amp_obs_size(self) -> int:
        return self.get_num_amp_obs()

    # -- motion --------------------------------------------------------------

    def _load_motion(self, motion_file: str):
        from ase_tpu.utils import paths

        self._motion_lib = ml.load_motion_lib(
            paths.motion_file(motion_file),
            self.model.dof_body_ids,
            self.model.dof_offsets,
            [int(i) for i in self._key_body_ids.tolist()],
        )

    # -- stepping ------------------------------------------------------------

    def _update_aux(self, state: EnvState) -> EnvState:
        state = super()._update_aux(state)
        return self._update_amp_obs(state)

    def _update_amp_obs(self, state: EnvState) -> EnvState:
        buf = state.aux["amp_obs"]
        buf = jnp.roll(buf, 1, axis=1)  # hist shift (reference 248-255)
        curr = self._compute_amp_observations(state)
        buf = buf.at[:, 0].set(curr)
        aux = dict(state.aux)
        aux["amp_obs"] = buf
        return state.replace(aux=aux)

    def _compute_amp_observations(self, state: EnvState) -> jnp.ndarray:
        key_body_pos = state.body_pos[:, self._key_body_ids, :]
        dof_pos = jax.vmap(lambda s: dynamics.dof_pos(self.model, s))(state.phys)
        dof_vel = state.phys.u[:, self.model.root_dofs : self.model.nu]
        return obs_kernels.build_amp_observations(
            state.body_pos[:, 0, :], state.body_quat[:, 0, :],
            state.body_vel[:, 0, :], state.body_ang_vel[:, 0, :],
            dof_pos, dof_vel, key_body_pos,
            self._local_root_obs, self._root_height_obs,
            self.model.dof_offsets,
        )

    def amp_obs_flat(self, state: EnvState) -> jnp.ndarray:
        return state.aux["amp_obs"].reshape(state.aux["amp_obs"].shape[0], -1)

    # -- demo fetch (reference humanoid_amp.py:64-101) -------------------------

    def fetch_amp_obs_demo(self, rng: jnp.ndarray, num_samples: int) -> jnp.ndarray:
        k1, k2 = jax.random.split(rng)
        motion_ids = ml.sample_motions(self._motion_lib, k1, num_samples)
        truncate_time = self.dt * (self._num_amp_obs_steps - 1)
        times0 = ml.sample_time(self._motion_lib, k2, motion_ids, truncate_time)
        times0 = times0 + truncate_time
        return self.build_amp_obs_demo(motion_ids, times0).reshape(num_samples, -1)

    def build_amp_obs_demo(self, motion_ids: jnp.ndarray, times0: jnp.ndarray) -> jnp.ndarray:
        steps = self._num_amp_obs_steps
        ids = jnp.tile(motion_ids[:, None], (1, steps)).reshape(-1)
        offsets = -self.dt * jnp.arange(steps)
        times = (times0[:, None] + offsets[None, :]).reshape(-1)
        ms = ml.get_motion_state(self._motion_lib, ids, times)
        amp = obs_kernels.build_amp_observations(
            ms["root_pos"], ms["root_rot"], ms["root_vel"], ms["root_ang_vel"],
            ms["dof_pos"], ms["dof_vel"], ms["key_pos"],
            self._local_root_obs, self._root_height_obs, self.model.dof_offsets,
        )
        return amp.reshape(motion_ids.shape[0], steps, -1)

    # -- resets ---------------------------------------------------------------

    def _ref_state_phys(self, ms: Dict[str, jnp.ndarray]) -> dynamics.State:
        """Batched physics state from a motion-state dict."""

        def build(root_pos, root_rot, dof_pos, root_vel, root_ang_vel, dof_vel):
            s = dynamics.default_state(self.model)
            s = dynamics.set_dof_state(self.model, s, dof_pos, dof_vel)
            s = dynamics.set_root_state(s, root_pos, root_rot, root_vel, root_ang_vel)
            return s

        return jax.vmap(build)(
            ms["root_pos"], ms["root_rot"], ms["dof_pos"],
            ms["root_vel"], ms["root_ang_vel"], ms["dof_vel"],
        )

    def _sample_ref_init(self, rng: jnp.ndarray, B: int):
        """Sample RSI states; by default also the AMP history frames.

        The reference issues two motion queries per reset: the RSI frame
        (humanoid_amp.py:160-186) and the (steps-1) history frames at -dt
        offsets (humanoid_amp.py:220-236). That two-query layout is the
        DEFAULT. ``ASE_TPU_FUSED_RESET_QUERY=1`` fuses both into ONE
        ``get_motion_state`` of B*steps rows (identical row inputs through
        row-wise kernels — exactly equal eager; under jit the different
        fusion reassociates fp at the ~ulp level), stashing the history
        block in a transient aux key for ``_init_amp_obs``. The fused form
        measured ≈ noise on single-chip (docs/PERF.md) and BREAKS 2-process
        multi-host CPU training (the per-process GSPMD compiles diverge on
        the reshaped-sharded-dim query and deadlock Gloo context init —
        tests/test_multihost.py fails deterministically with it on), so it
        is opt-in for single-host experiments only.

        Returns (phys, motion_ids, motion_times, hist_amp_or_None).
        """
        k1, k2 = jax.random.split(rng)
        motion_ids = ml.sample_motions(self._motion_lib, k1, B)
        if self._state_init == StateInit.Start:
            motion_times = jnp.zeros(B)
        else:
            motion_times = ml.sample_time(self._motion_lib, k2, motion_ids)
        if os.environ.get("ASE_TPU_FUSED_RESET_QUERY", "0") != "1":
            ms = ml.get_motion_state(self._motion_lib, motion_ids, motion_times)
            return self._ref_state_phys(ms), motion_ids, motion_times, None
        steps = self._num_amp_obs_steps
        ids = jnp.tile(motion_ids[:, None], (1, steps)).reshape(-1)
        offs = -self.dt * jnp.arange(steps)
        times = (motion_times[:, None] + offs[None, :]).reshape(-1)
        ms = ml.get_motion_state(self._motion_lib, ids, times)
        ms0 = {
            k: v.reshape((B, steps) + v.shape[1:])[:, 0] for k, v in ms.items()
        }
        # amp obs on all B*steps rows (row-wise kernel: rows 1.. match the
        # split path's history build exactly); slice off the RSI row
        hist = obs_kernels.build_amp_observations(
            ms["root_pos"], ms["root_rot"], ms["root_vel"], ms["root_ang_vel"],
            ms["dof_pos"], ms["dof_vel"], ms["key_pos"],
            self._local_root_obs, self._root_height_obs, self.model.dof_offsets,
        ).reshape(B, steps, -1)[:, 1:]
        return self._ref_state_phys(ms0), motion_ids, motion_times, hist

    def _reset_actors(self, state: EnvState, mask) -> Tuple[EnvState, jnp.ndarray]:
        B = mask.shape[0]
        state, keys = self.split_rng(state, 2)

        hist_amp = None
        if self._state_init == StateInit.Default:
            phys = self.default_phys_state(B)
            ref_mask = jnp.zeros(B, bool)
            motion_ids = jnp.zeros(B, jnp.int32)
            motion_times = jnp.zeros(B)
        else:
            ref_phys, motion_ids, motion_times, hist_amp = self._sample_ref_init(
                keys[0], B)
            if self._state_init in (StateInit.Start, StateInit.Random):
                phys = ref_phys
                ref_mask = jnp.ones(B, bool)
            else:  # Hybrid
                bern = jax.random.uniform(keys[1], (B,)) < self._hybrid_init_prob
                default_phys = self.default_phys_state(B)
                phys = jax.tree_util.tree_map(
                    lambda a, b: a if (hasattr(a, "size") and a.size == 0)
                    else jnp.where(
                        bern.reshape((B,) + (1,) * (a.ndim - 1)), a, b
                    ),
                    ref_phys, default_phys,
                )
                ref_mask = bern

        aux = dict(state.aux)
        aux["reset_ref_mask"] = ref_mask & mask
        aux["reset_motion_ids"] = motion_ids
        aux["reset_motion_times"] = motion_times
        if hist_amp is not None:
            # transient: consumed (and popped) by _init_amp_obs before the
            # chunked reset scatters the sub-state back (treedefs must match)
            aux["_reset_hist_amp"] = hist_amp
        new_state = state.replace(phys=phys, aux=aux)
        return new_state, mask

    def _initial_aux(self, B: int) -> Dict[str, Any]:
        aux = super()._initial_aux(B)
        aux["amp_obs"] = jnp.zeros(
            (B, self._num_amp_obs_steps, self._num_amp_obs_per_step)
        )
        aux["reset_ref_mask"] = jnp.zeros(B, bool)
        aux["reset_motion_ids"] = jnp.zeros(B, jnp.int32)
        aux["reset_motion_times"] = jnp.zeros(B)
        return aux

    def _post_reset(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        state = super()._post_reset(state, mask)
        return self._init_amp_obs(state, mask)

    def _init_amp_obs(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        """Fill the history window for freshly reset envs
        (reference humanoid_amp.py:203-236)."""
        B = mask.shape[0]
        curr = self._compute_amp_observations(state)

        ref_mask = state.aux["reset_ref_mask"]
        steps = self._num_amp_obs_steps

        aux = dict(state.aux)
        hist_ref = aux.pop("_reset_hist_amp", None)
        if hist_ref is None:
            # split path (the default, Default init, or subclasses that
            # bypass _sample_ref_init): history from the motion at -dt
            # offsets for ref-init envs
            ids = jnp.tile(
                state.aux["reset_motion_ids"][:, None], (1, steps - 1)
            ).reshape(-1)
            offs = -self.dt * (jnp.arange(steps - 1) + 1)
            times = (
                state.aux["reset_motion_times"][:, None] + offs[None, :]
            ).reshape(-1)
            ms = ml.get_motion_state(self._motion_lib, ids, times)
            hist_ref = obs_kernels.build_amp_observations(
                ms["root_pos"], ms["root_rot"], ms["root_vel"], ms["root_ang_vel"],
                ms["dof_pos"], ms["dof_vel"], ms["key_pos"],
                self._local_root_obs, self._root_height_obs, self.model.dof_offsets,
            ).reshape(B, steps - 1, -1)

        hist_default = jnp.tile(curr[:, None, :], (1, steps - 1, 1))

        buf = state.aux["amp_obs"]
        new_hist = jnp.where(ref_mask[:, None, None], hist_ref, hist_default)
        new_buf = jnp.concatenate([curr[:, None], new_hist], axis=1)
        buf = jnp.where(mask[:, None, None], new_buf, buf)

        aux["amp_obs"] = buf
        return state.replace(aux=aux)
