"""HumanoidAMPGetup: fall-recovery curriculum.

Capability-parity with reference ``ase/env/tasks/humanoid_amp_getup.py``:
fall states are generated once at startup by simulating random poses for 150
steps (here: one jitted rollout), a fraction of resets start from fall states,
terminated episodes can continue as recovery episodes, and termination is
disabled during a recovery window.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ase_tpu.envs.humanoid import EnvState
from ase_tpu.envs.humanoid_amp import HumanoidAMP
from ase_tpu.ops import quat as rot
from ase_tpu.physics import dynamics, engine


class HumanoidAMPGetup(HumanoidAMP):
    def __init__(self, cfg, headless: bool = True):
        env_cfg = cfg["env"]
        self._recovery_episode_prob = float(env_cfg["recoveryEpisodeProb"])
        self._recovery_steps = int(env_cfg["recoverySteps"])
        self._fall_init_prob = float(env_cfg["fallInitProb"])

        super().__init__(cfg, headless=headless)

        self._fall_states = None  # generated lazily (requires jit rollout)

    # -- fall state generation (reference humanoid_amp_getup.py:42-76) --------

    def generate_fall_states(self, rng: jnp.ndarray):
        """Simulate random-orientation drops for 150 steps; cache the results."""
        B = self.num_envs
        k1, k2 = jax.random.split(rng)
        q = jax.random.normal(k1, (B, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        phys = self.default_phys_state(B)
        phys = phys._replace(root_quat=q)

        rand_actions = jax.random.uniform(
            k2, (B, self.get_action_size()), minval=-0.5, maxval=0.5
        )
        tgt = self._pd_action_offset[None] + self._pd_action_scale[None] * rand_actions

        def body(s, _):
            out = engine.step_batched(self.model, self.sim_cfg, self._tables, s, tgt)
            return out.state, None

        phys, _ = jax.lax.scan(body, phys, None, length=150)
        # zero velocities, keep poses
        u = phys.u * 0.0
        phys = phys._replace(u=u)
        self._fall_states = phys
        return phys

    def initial_state(self, rng: jnp.ndarray) -> EnvState:
        k1, k2 = jax.random.split(rng)
        if self._fall_states is None:
            self.generate_fall_states(k1)  # must run before the jit trace
        return super().initial_state(k2)

    # -- resets (reference humanoid_amp_getup.py:78-116) ----------------------

    def _initial_aux(self, B: int) -> Dict[str, Any]:
        aux = super()._initial_aux(B)
        aux["recovery_counter"] = jnp.zeros(B, jnp.int32)
        return aux

    def _reset_actors(self, state: EnvState, mask) -> Tuple[EnvState, jnp.ndarray]:
        B = mask.shape[0]
        state, keys = self.split_rng(state, 3)

        recovery = (
            (jax.random.uniform(keys[0], (B,)) < self._recovery_episode_prob)
            & (state.terminate_buf == 1)
        )
        fall = (
            (jax.random.uniform(keys[1], (B,)) < self._fall_init_prob) & ~recovery
        )

        # base candidates from the AMP reset logic
        new_state, mask = super()._reset_actors(state, mask)

        # fall-state candidates: random cached fall pose
        idx = jax.random.randint(keys[2], (B,), 0, self.num_envs)
        fall_phys = jax.tree_util.tree_map(
            lambda x: x if (hasattr(x, "size") and x.size == 0) else x[idx],
            self._fall_states)

        def pick(base, fallv, cur):
            if hasattr(base, "size") and base.size == 0:
                return base  # skip zero-sized leaves (empty prop state)
            m_f = fall.reshape((B,) + (1,) * (base.ndim - 1))
            m_r = recovery.reshape((B,) + (1,) * (base.ndim - 1))
            out = jnp.where(m_f, fallv, base)
            return jnp.where(m_r, cur, out)  # recovery: keep current state

        phys = jax.tree_util.tree_map(pick, new_state.phys, fall_phys, state.phys)

        aux = dict(new_state.aux)
        # fall/recovery episodes behave like default init for AMP history
        aux["reset_ref_mask"] = aux["reset_ref_mask"] & ~fall & ~recovery
        counter = aux["recovery_counter"]
        counter = jnp.where(
            mask & (fall | recovery), self._recovery_steps,
            jnp.where(mask, 0, counter),
        )
        aux["recovery_counter"] = counter
        return new_state.replace(phys=phys, aux=aux), mask

    # -- recovery window (reference 131-142) ----------------------------------

    def pre_physics_step(self, state, actions):
        state, tgt = super().pre_physics_step(state, actions)
        aux = dict(state.aux)
        aux["recovery_counter"] = jnp.maximum(aux["recovery_counter"] - 1, 0)
        return state.replace(aux=aux), tgt

    def _compute_reset(self, state: EnvState):
        reset, term = super()._compute_reset(state)
        is_recovery = state.aux["recovery_counter"] > 0
        reset = jnp.where(is_recovery, 0, reset)
        term = jnp.where(is_recovery, 0, term)
        return reset, term
