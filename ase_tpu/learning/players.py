"""Evaluation players (reference ``ase/learning/*_players.py``).

Run a restored policy without training, with the reference player loop's
semantics expressed the TPU way:

* a ``games_num`` episode budget with per-game-batch stat prints (reference
  ``common_player.py:25-127`` prints ``reward: .. steps: ..`` every step that
  finishes games, then ``av reward / av steps``) — the rollout runs as jitted
  fixed-length scan *chunks* that emit per-step finished-game tallies, so the
  loop stays on-device while the host replays the reference's print cadence;
* ``_amp_debug``-style disc/enc probes evaluated inside the loop on env 0's
  live AMP observation (reference ``amp_players.py:33-56``,
  ``ase_players.py:82-98`` print them when a viewer is attached; here they are
  printed each chunk when ``debug_probes`` is on, and returned from ``run``);
* a real HRL player: the high-level action is a latent driven through the
  frozen LLC by the agent's 5-step ``_env_step`` window, with the LLC
  discriminator reward probed along the way (reference
  ``hrl_players.py:169-208``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.learning import checkpoint as ckpt


class CommonPlayer:
    """Evaluates a CommonAgent-family checkpoint.

    Reference: ``common_player.py`` — deterministic-mu or sampled actions,
    env resets for done envs, per-game reward/length accounting.
    """

    def __init__(self, agent, deterministic: bool = True,
                 games_num: Optional[int] = None, debug_probes: bool = False,
                 print_stats: bool = True):
        self.agent = agent
        self.env = agent.env
        self.deterministic = deterministic
        pcfg = agent.config.get("player", {}) or {}
        # rl_games BasePlayer defaults games_num to 2000: with games_num far
        # above num_envs every env completes several episodes before the
        # budget is reached, so the reported mean is not biased toward the
        # earliest-terminating (shortest) episodes. A small budget (e.g. 20)
        # stops the count mid-first-episode and reports ONLY failures.
        self.games_num = int(games_num if games_num is not None
                             else pcfg.get("games_num", 2000))
        self.debug_probes = bool(debug_probes)
        self.print_stats = bool(print_stats)
        self._chunk_fns: Dict[int, Any] = {}  # num_steps -> jitted rollout

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

    _MARKER_KEYS = ("tar_dir", "tar_facing_dir", "tar_pos")

    def _run_chunk(self, ts, env_state, roll, ret, lens, succ, num_steps,
                   capture_env: int = -1, success_fn=None):
        """One jitted fixed-length rollout chunk. Returns the carried state
        plus per-step finished-game tallies (count, summed returns, summed
        lengths, end-of-episode successes, summed success-time fractions) for
        the host-side game loop, and — when ``capture_env`` ≥ 0 — that env's
        per-step body positions + task-marker values for video rendering.
        ``success_fn(env_state) -> (B,) in [0, 1]`` is an optional per-step
        goal-attainment indicator (the reference observer consumes
        infos['successes'] at done indices, run.py:66-97); the default reads
        ``aux['successes']`` when a task publishes it (Strike). The compiled
        chunk is cached per (length, capture, success) key."""
        key = (num_steps, capture_env >= 0, success_fn is not None)
        loop = self._chunk_fns.get(key)
        if loop is None:

            @jax.jit
            def loop(ts, env_state, roll, ret, lens, succ):
                def body(carry, _):
                    ts, env_state, roll, ret, lens, succ = carry
                    ts, env_state, roll, rewards = self._policy_step(
                        ts, env_state, roll)
                    ret = ret + rewards
                    lens = lens + 1
                    if success_fn is not None:
                        s = success_fn(env_state).astype(jnp.float32)
                    else:
                        aux = getattr(env_state, "aux", {}) or {}
                        s = aux.get("successes", jnp.zeros_like(ret))
                    succ = succ + s
                    done = env_state.reset_buf > 0
                    step_out = (
                        jnp.sum(done),
                        jnp.sum(jnp.where(done, ret, 0.0)),
                        jnp.sum(jnp.where(done, lens, 0)),
                        jnp.sum(jnp.where(done, s, 0.0)),
                        jnp.sum(jnp.where(
                            done, succ / jnp.maximum(lens, 1), 0.0)),
                    )
                    if capture_env >= 0:
                        aux = getattr(env_state, "aux", {}) or {}
                        frame = {"body_pos": env_state.body_pos[capture_env]}
                        for k in self._MARKER_KEYS:
                            if k in aux:
                                frame[k] = aux[k][capture_env]
                        step_out = step_out + (frame,)
                    ret = jnp.where(done, 0.0, ret)
                    lens = jnp.where(done, 0, lens)
                    succ = jnp.where(done, 0.0, succ)
                    return (ts, env_state, roll, ret, lens, succ), step_out

                carry, ys = jax.lax.scan(
                    body, (ts, env_state, roll, ret, lens, succ), None,
                    length=num_steps
                )
                return carry, ys

            self._chunk_fns[key] = loop

        return loop(ts, env_state, roll, ret, lens, succ)

    # -- probe hook (reference _post_step/_amp_debug) -------------------------

    def _probe(self, ts, env_state, roll) -> Dict[str, float]:
        """Live model diagnostics on the current env state; overridden by
        AMP/ASE/HRL players. Called once per chunk when debug_probes is on."""
        return {}

    def run(self, num_steps: int = 300, games_num: Optional[int] = None,
            ts=None, env_state=None, max_chunks: int = 100,
            video_path: Optional[str] = None, video_env: int = 0,
            video_max_frames: int = 900, success_fn=None):
        """Reference ``CommonPlayer.run``: play until ``games_num`` episodes
        finish (in chunks of ``num_steps`` on-device steps), printing
        per-game-batch stats, then the aggregate.

        With ``video_path`` set, env ``video_env``'s body positions (and any
        heading/location/strike task markers) are captured each step and
        rendered to video at the end — the headless stand-in for the
        reference's live viewer eval (reference base_task.py:142-164)."""
        games_num = int(games_num if games_num is not None else self.games_num)
        ts = ts if ts is not None else self.ts
        if env_state is None:
            env_state = self.env.initial_state(jax.random.PRNGKey(1))
        roll = self.agent._init_rollout_carry(ts, env_state)

        B = self.env.num_envs
        ret = jnp.zeros(B)
        lens = jnp.zeros(B, jnp.int32)
        succ = jnp.zeros(B)
        games_played = 0
        sum_rewards = 0.0
        sum_steps = 0.0
        sum_succ_end = 0.0
        sum_succ_frac = 0.0
        probes: Dict[str, float] = {}
        capture_env = video_env if video_path else -1
        captured: list = []

        for _ in range(max_chunks):
            (ts, env_state, roll, ret, lens, succ), ys = self._run_chunk(
                ts, env_state, roll, ret, lens, succ, num_steps,
                capture_env=capture_env, success_fn=success_fn,
            )
            if capture_env >= 0:
                *ys, frames = ys
                if len(captured) * num_steps < video_max_frames:
                    captured.append(jax.device_get(frames))
            counts, rsums, lsums, ssums, sfracs = (
                np.asarray(y) for y in jax.device_get(ys))
            for c, r, l, se, sf in zip(counts, rsums, lsums, ssums, sfracs):
                if c > 0:
                    games_played += int(c)
                    sum_rewards += float(r)
                    sum_steps += float(l)
                    sum_succ_end += float(se)
                    sum_succ_frac += float(sf)
                    if self.print_stats:
                        print(f"reward: {float(r) / int(c):.4f} "
                              f"steps: {float(l) / int(c):.1f}")
                    if games_played >= games_num:
                        break
            if self.debug_probes:
                probes = {k: float(v) for k, v in
                          self._probe(ts, env_state, roll).items()}
                print("probe: " + " ".join(
                    f"{k}: {v:.4f}" for k, v in probes.items()))
            if games_played >= games_num:
                break

        if video_path and captured:
            from ase_tpu.viz.plotter import render_rollout
            merged = {
                k: np.concatenate([np.asarray(c[k]) for c in captured])[
                    :video_max_frames]
                for k in captured[0]
            }
            fps = 1.0 / float(getattr(self.env, "dt", 1.0 / 30.0))
            written = render_rollout(
                self.env.model.parents, merged.pop("body_pos"),
                markers=merged, fps=fps, save_path=video_path,
                title=self.agent.config.get("name", ""))
            print(f"rollout video written: {written}")

        n = max(games_played, 1)
        stats = {
            "mean_return": sum_rewards / n,
            "mean_length": sum_steps / n,
            "episodes": games_played,
            "running_return_mean": float(jnp.mean(ret)),
            # goal-attainment meters (reference successes observer):
            # end-of-episode indicator rate and mean in-episode time fraction
            "success_rate": sum_succ_end / n,
            "success_time_frac": sum_succ_frac / n,
            **probes,
        }
        print(f"av reward: {stats['mean_return']:.4f} "
              f"av steps: {stats['mean_length']:.1f} "
              f"episodes: {games_played}")
        return stats


class AMPPlayer(CommonPlayer):
    """Adds the discriminator probe (reference ``amp_players.py:33-56``
    ``_amp_debug``: disc logit + disc reward of env 0's live AMP obs)."""

    def disc_reward(self, ts, env_state):
        amp_obs = self.env.amp_obs_flat(env_state)
        return self.agent._calc_disc_rewards(ts, amp_obs)

    def _amp_debug(self, ts, env_state) -> Dict[str, float]:
        amp_obs = self.env.amp_obs_flat(env_state)[0:1]
        logit = self.agent._eval_disc(
            ts.params, self.agent._norm_amp(ts, amp_obs))
        disc_r = self.agent._calc_disc_rewards(ts, amp_obs)
        return {
            "disc_pred": float(np.asarray(logit)[0, 0]),
            "disc_reward": float(np.asarray(disc_r)[0, 0]),
        }

    def _probe(self, ts, env_state, roll):
        out = super()._probe(ts, env_state, roll)
        out.update(self._amp_debug(ts, env_state))
        return out


class ASEPlayer(AMPPlayer):
    """Latent-conditioned playback. Latent resets on env reset and the
    scheduled resample run inside the agent's ``_pre_rollout_step`` (reference
    ``ase_players.py:60-98`` ``_update_latents``/``_reset_latents``); the
    probe adds the encoder reward of env 0 under its current latent."""

    def enc_reward(self, ts, env_state, latents):
        amp_obs = self.env.amp_obs_flat(env_state)
        return self.agent._calc_enc_rewards(ts, amp_obs, latents)

    def _probe(self, ts, env_state, roll):
        out = super()._probe(ts, env_state, roll)
        amp_obs = self.env.amp_obs_flat(env_state)[0:1]
        z = roll["ase_latents"][0:1]
        enc_r = self.agent._calc_enc_rewards(ts, amp_obs, z)
        out["enc_reward"] = float(np.asarray(enc_r)[0, 0])
        return out


class HRLPlayer(CommonPlayer):
    """High-level-controller eval (reference ``hrl_players.py:169-208``).

    The policy's action IS a 64-d latent; ``agent._env_step`` drives it
    through the frozen LLC for ``llc_steps`` inner sim steps per decision, so
    the player's rollout loop needs no special casing — the probe reports the
    LLC discriminator's opinion of the resulting motion (the reference prints
    the per-window averaged disc reward)."""

    def _probe(self, ts, env_state, roll):
        out = super()._probe(ts, env_state, roll)
        amp_obs = self.env.amp_obs_flat(env_state)[0:1]
        disc_r = self.agent._calc_disc_reward(amp_obs)
        out["llc_disc_reward"] = float(np.asarray(disc_r)[0, 0])
        return out


PLAYER_REGISTRY = {
    "common": CommonPlayer,
    "amp": AMPPlayer,
    "ase": ASEPlayer,
    "hrl": HRLPlayer,
}
