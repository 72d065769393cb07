"""Evaluation players (reference ``ase/learning/*_players.py``).

Run a restored policy without training: jitted rollout loop with masked env
resets, deterministic (mean) or stochastic actions, episode-return/length
tracking, AMP disc/enc reward probes (the reference's ``_amp_debug``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.learning import checkpoint as ckpt
from ase_tpu.models import networks


class CommonPlayer:
    """Evaluates a CommonAgent-family checkpoint."""

    def __init__(self, agent, deterministic: bool = True):
        self.agent = agent
        self.env = agent.env
        self.deterministic = deterministic
        self._step_jit = None

    def restore(self, path: str, ts=None):
        if ts is None:
            ts = self.agent.init_train_state(jax.random.PRNGKey(0))
        self.ts = ckpt.restore(path, ts, strict=False)
        return self.ts

    def _policy_step(self, ts, env_state, roll):
        env_state = self.env.reset_done(env_state)
        ts, env_state, roll = self.agent._pre_rollout_step(ts, env_state, roll)
        obs_n = (
            ts.obs_rms.normalize(env_state.obs)
            if self.agent.normalize_input else env_state.obs
        )
        mu, log_sigma = self.agent._actor_sigma(ts.params, obs_n, roll)
        if self.deterministic:
            actions = mu
        else:
            rng, k = jax.random.split(ts.rng)
            ts = ts.replace(rng=rng)
            actions = mu + jnp.exp(log_sigma) * jax.random.normal(k, mu.shape)
        ts, env_state, rewards, infos, roll = self.agent._env_step(
            ts, env_state, actions, roll
        )
        return ts, env_state, roll, rewards

    def run(self, num_steps: int = 300, ts=None, env_state=None):
        ts = ts if ts is not None else self.ts
        if env_state is None:
            env_state = self.env.initial_state(jax.random.PRNGKey(1))
        roll = self.agent._init_rollout_carry(ts, env_state)

        @jax.jit
        def loop(ts, env_state, roll):
            def body(carry, _):
                ts, env_state, roll, ret, lens, done_ret, n_done = carry
                ts, env_state, roll, rewards = self._policy_step(ts, env_state, roll)
                ret = ret + rewards
                lens = lens + 1
                done = env_state.reset_buf > 0
                done_ret = done_ret + jnp.sum(jnp.where(done, ret, 0.0))
                n_done = n_done + jnp.sum(done)
                ret = jnp.where(done, 0.0, ret)
                lens = jnp.where(done, 0, lens)
                return (ts, env_state, roll, ret, lens, done_ret, n_done), None

            B = self.env.num_envs
            init = (
                ts, env_state, roll, jnp.zeros(B), jnp.zeros(B, jnp.int32),
                jnp.asarray(0.0), jnp.asarray(0, jnp.int32),
            )
            (ts, env_state, roll, ret, lens, done_ret, n_done), _ = jax.lax.scan(
                body, init, None, length=num_steps
            )
            return ts, env_state, done_ret, n_done, ret, lens

        ts, env_state, done_ret, n_done, ret, lens = loop(ts, env_state, roll)
        n = max(int(n_done), 1)
        stats = {
            "mean_return": float(done_ret) / n,
            "episodes": int(n_done),
            "running_return_mean": float(jnp.mean(ret)),
        }
        print(f"player: {stats}")
        return stats


class AMPPlayer(CommonPlayer):
    """Adds disc-reward probing (reference amp_players.py)."""

    def disc_reward(self, ts, env_state):
        amp_obs = self.env.amp_obs_flat(env_state)
        return self.agent._calc_disc_rewards(ts, amp_obs)


class ASEPlayer(AMPPlayer):
    """Latent-conditioned playback (reference ase_players.py)."""

    def enc_reward(self, ts, env_state, latents):
        amp_obs = self.env.amp_obs_flat(env_state)
        return self.agent._calc_enc_rewards(ts, amp_obs, latents)


class HRLPlayer(CommonPlayer):
    pass


PLAYER_REGISTRY = {
    "common": CommonPlayer,
    "amp": AMPPlayer,
    "ase": ASEPlayer,
    "hrl": HRLPlayer,
}
