"""CommonAgent: the PPO core (reference ``ase/learning/common_agent.py``).

Design: instead of a Python training loop calling into torch ops, the entire
epoch — 32-step rollout (with masked partial resets and reference-state init),
GAE with termination-aware next-value bootstraps, advantage normalization,
and 6×minibatch PPO updates — is ONE jitted pure function
``train_epoch(train_state, env_state) -> (train_state, env_state, metrics)``.
Env state, experience tensors, normalizer stats, optimizer state and RNG never
leave the device (SURVEY §7 design rule: no host round trips inside the
epoch).

Loss semantics follow the reference exactly: clipped surrogate
(common_agent.py:505-519), unclipped value MSE ×critic_coef (521-534), soft
bound loss ×bounds_loss_coef (456-464), GAE with stored next_values
(437-449), value/obs running-mean-std parity with rl_games train/eval modes.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ase_tpu.learning.running_mean_std import RunningMeanStd
from ase_tpu.models import networks


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    obs_rms: RunningMeanStd
    value_rms: RunningMeanStd
    rng: jnp.ndarray
    epoch: jnp.ndarray        # int32
    frame: jnp.ndarray        # int32
    extra: Dict[str, Any]     # subclass state (AMP buffers, latents, ...)


class CommonAgent:
    """Builds and runs the jitted PPO train epoch for a functional env."""

    def __init__(self, env, cfg_train: Dict[str, Any], output_dir: str = "output"):
        self.env = env
        self.cfg_train = cfg_train
        params = cfg_train["params"]
        config = params["config"]
        self.config = config
        self.output_dir = output_dir

        self.num_actors = env.num_envs
        self.horizon_length = int(config["horizon_length"])
        self.minibatch_size = int(config["minibatch_size"])
        self.mini_epochs = int(config["mini_epochs"])
        self.gamma = float(config["gamma"])
        self.tau = float(config["tau"])
        self.e_clip = float(config["e_clip"])
        self.critic_coef = float(config["critic_coef"])
        self.bounds_loss_coef = float(config.get("bounds_loss_coef", 0.0))
        self.entropy_coef = float(config.get("entropy_coef", 0.0))
        self.grad_norm = float(config.get("grad_norm", 1.0))
        self.truncate_grads = bool(config.get("truncate_grads", False))
        self.normalize_input = bool(config.get("normalize_input", True))
        self.normalize_value = bool(config.get("normalize_value", True))
        self.normalize_advantage = bool(config.get("normalize_advantage", True))
        self.learning_rate = float(config["learning_rate"])
        self.lr_schedule = str(config.get("lr_schedule", "constant"))
        self.kl_threshold = float(config.get("kl_threshold", 0.008))
        self.max_epochs = int(config.get("max_epochs", 10000))
        self.save_frequency = int(config.get("save_frequency", 50))
        self.save_best_after = int(config.get("save_best_after", 50))
        self._save_intermediate = bool(config.get("save_intermediate", False))
        self.games_to_track = int(config.get("games_to_track", 100))
        # data-parallel env sharding over a device mesh (reference Horovod
        # mode, run.py:36-50); set by setup_mesh() before train()
        self.mesh = None

        self.batch_size = self.horizon_length * self.num_actors
        assert self.batch_size % self.minibatch_size == 0, (
            f"batch {self.batch_size} % minibatch {self.minibatch_size} != 0"
        )
        self.num_minibatches = self.batch_size // self.minibatch_size

        self.obs_dim = env.get_obs_size()
        self.action_dim = self._actions_num()
        self.network = self._build_network()

        if self.lr_schedule == "adaptive":
            # rl_games AdaptiveScheduler semantics: KL-tracked LR inside jit
            tx = optax.inject_hyperparams(optax.adam)(
                learning_rate=self.learning_rate, eps=1e-8
            )
        else:
            tx = optax.adam(self.learning_rate, eps=1e-8)
        if self.truncate_grads:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_norm), tx)
        self.optimizer = tx

        self._train_epoch_jit = None

    # -- overridables ---------------------------------------------------------

    def _actions_num(self) -> int:
        return self.env.get_action_size()

    def _build_network(self):
        raise NotImplementedError

    def _net_init_args(self, rng):
        raise NotImplementedError

    def _init_extra(self, rng) -> Dict[str, Any]:
        B = self.num_actors
        K = self.games_to_track
        return {
            "cur_rewards": jnp.zeros(B),
            "cur_lengths": jnp.zeros(B),
            # windowed episode meters (rl_games AverageMeter over the last
            # `games_to_track` finished games): ring buffers + head/total
            "game_rewards_buf": jnp.zeros(K),
            "game_lengths_buf": jnp.zeros(K),
            "game_head": jnp.zeros((), jnp.int32),
            "game_total": jnp.zeros(()),
            # per-game success meter (reference run.py:66-97 RLGPUAlgoObserver
            # consumes infos['successes'] at done indices into an
            # AverageMeter); tasks publish aux['successes'] to feed it
            "game_success_buf": jnp.zeros(K),
            # best-reward watermark for the save-best gate: checkpointed so
            # a resumed run does not overwrite <name>_best.ckpt with a worse
            # policy (reference rl_games last_mean_rewards restore)
            "best_mean_rewards": jnp.asarray(-1e9),
        }

    def _ckpt_exclude(self) -> tuple:
        """Key substrings omitted from checkpoints: reconstructible device
        buffers (the reference .pth doesn't persist them either). Subclasses
        extend; config save_buffers=true forces full-fidelity checkpoints
        (used by the exact-resume test)."""
        if bool(self.config.get("save_buffers", False)):
            return ()
        return self._transient_extra()

    def _transient_extra(self) -> tuple:
        return ()

    def _stamp_best(self, ts: "TrainState") -> "TrainState":
        """Stamp the host-side best-reward watermark into the pytree about to
        be saved (keeps the in-flight train state's device placement
        untouched)."""
        best = float(getattr(self, "_best_mean_rewards", -1e9))
        return ts.replace(
            extra={**ts.extra, "best_mean_rewards": jnp.asarray(best)})

    def _actor_sigma(self, params, obs_n, extra):
        """(mu, sigma) for the normalized obs batch."""
        raise NotImplementedError

    def _critic(self, params, obs_n, extra):
        raise NotImplementedError

    # -- state ----------------------------------------------------------------

    def init_train_state(self, rng: jnp.ndarray) -> TrainState:
        k1, k2, k3 = jax.random.split(rng, 3)
        params = self.network.init(k1, *self._net_init_args(k2))
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            obs_rms=RunningMeanStd.create((self.obs_dim,)),
            value_rms=RunningMeanStd.create((1,)),
            rng=k3,
            epoch=jnp.asarray(0, jnp.int32),
            frame=jnp.asarray(0, jnp.int32),
            extra=self._init_extra(rng),
        )

    # -- obs/value preprocessing (rl_games RunningMeanStd semantics) ----------

    def _preproc_obs(self, ts: TrainState, obs, update: bool):
        if not self.normalize_input:
            return ts, obs
        rms = ts.obs_rms
        if update:
            rms = rms.update(obs)
            ts = ts.replace(obs_rms=rms)
        return ts, rms.normalize(obs)

    def _denorm_value(self, ts: TrainState, v):
        if not self.normalize_value:
            return v
        return ts.value_rms.denormalize(v)

    # -- policy sampling -------------------------------------------------------

    def _neglogp(self, actions, mu, log_sigma):
        sigma = jnp.exp(log_sigma)
        return (
            0.5 * jnp.sum(jnp.square((actions - mu) / sigma), axis=-1)
            + 0.5 * np.log(2.0 * np.pi) * actions.shape[-1]
            + jnp.sum(log_sigma, axis=-1)
        )

    def _entropy(self, log_sigma):
        return jnp.sum(log_sigma + 0.5 * np.log(2.0 * np.pi * np.e), axis=-1)

    def _policy_kl(self, mu, log_sigma, old_mu, old_log_sigma):
        """Analytic diagonal-gaussian KL (rl_games torch_ext.policy_kl)."""
        s, so = jnp.exp(log_sigma), jnp.exp(old_log_sigma)
        kl = (
            old_log_sigma - log_sigma
            + (jnp.square(so) + jnp.square(mu - old_mu)) / (2.0 * jnp.square(s))
            - 0.5
        )
        return jnp.mean(jnp.sum(kl, axis=-1))

    def _update_game_meters(self, extra, rewards, dones, successes=None):
        """Windowed episode meters: ring buffers over the last
        `games_to_track` finished games (rl_games AverageMeter semantics,
        reference common_agent.py:106-117). Finished envs are compacted into
        consecutive ring slots via a cumsum rank; non-finished envs scatter
        out-of-bounds and are dropped."""
        extra = dict(extra)
        K = self.games_to_track
        cur_r = extra["cur_rewards"] + rewards
        cur_l = extra["cur_lengths"] + 1.0
        done_mask = dones > 0
        fin_rank = jnp.cumsum(dones).astype(jnp.int32) - 1
        n_fin = jnp.sum(dones)
        # with more than K finishes in one step (possible at 4096 envs with
        # synchronized resets) the ring would wrap within a single scatter,
        # giving duplicate indices with unspecified winners — keep only the
        # LAST K finished games so the window is exactly "the last K games"
        keep = fin_rank >= n_fin.astype(jnp.int32) - K
        pos = jnp.where(done_mask & keep, (extra["game_head"] + fin_rank) % K, K)
        extra["game_rewards_buf"] = extra["game_rewards_buf"].at[pos].set(
            cur_r, mode="drop"
        )
        extra["game_lengths_buf"] = extra["game_lengths_buf"].at[pos].set(
            cur_l, mode="drop"
        )
        if successes is not None:
            extra["game_success_buf"] = extra["game_success_buf"].at[pos].set(
                successes, mode="drop"
            )
        extra["game_head"] = (extra["game_head"] + n_fin.astype(jnp.int32)) % K
        extra["game_total"] = extra["game_total"] + n_fin
        extra["cur_rewards"] = cur_r * (1.0 - dones)
        extra["cur_lengths"] = cur_l * (1.0 - dones)
        return extra

    # -- rollout hooks ---------------------------------------------------------

    def _pre_rollout_step(self, ts: TrainState, env_state, roll):
        """Per-step hook before action selection (latent updates etc.)."""
        return ts, env_state, roll

    def _init_rollout_carry(self, ts: TrainState, env_state) -> Dict[str, Any]:
        return {}

    def _record_step(self, ts, env_state, roll, rec, infos):
        """Extend the per-step record dict (AMP obs, latents, ...).
        `infos` is the dict returned by `_env_step` (e.g. HRL per-window
        disc rewards) — an explicit contract, no attribute swapping."""
        return rec

    def _env_step(self, ts: TrainState, env_state, actions, roll):
        """One env transition (HRL overrides with the 5-step LLC loop)."""
        env_state = self.env.step(env_state, actions)
        rewards = env_state.rew
        infos = {}
        return ts, env_state, rewards, infos, roll

    def _rand_action_mask(self, ts, rng):
        return jnp.ones(self.num_actors)

    # -- rollout ---------------------------------------------------------------

    def _rollout(self, ts: TrainState, env_state):
        def step_fn(carry, _):
            ts, env_state, roll = carry
            env_state = self.env.reset_done(env_state)
            ts, env_state, roll = self._pre_rollout_step(ts, env_state, roll)

            obs = env_state.obs
            obs_n = ts.obs_rms.normalize(obs) if self.normalize_input else obs

            ts_rng, k_act, k_mask = jax.random.split(ts.rng, 3)
            ts = ts.replace(rng=ts_rng)

            mu, log_sigma = self._actor_sigma(ts.params, obs_n, roll)
            value = self._critic(ts.params, obs_n, roll)
            value = self._denorm_value(ts, value)

            noise = jax.random.normal(k_act, mu.shape)
            sampled = mu + jnp.exp(log_sigma) * noise
            rand_mask = self._rand_action_mask(ts, k_mask)
            actions = jnp.where(rand_mask[:, None] > 0, sampled, mu)
            neglogp = self._neglogp(actions, mu, log_sigma)

            ts, env_state, rewards, infos, roll = self._env_step(
                ts, env_state, actions, roll
            )
            dones = env_state.reset_buf.astype(jnp.float32)
            terminated = env_state.terminate_buf.astype(jnp.float32)

            ts = ts.replace(extra=self._update_game_meters(
                ts.extra, rewards, dones,
                successes=env_state.aux.get("successes"),
            ))

            next_obs_n = (
                ts.obs_rms.normalize(env_state.obs)
                if self.normalize_input else env_state.obs
            )
            next_value = self._critic(ts.params, next_obs_n, roll)
            next_value = self._denorm_value(ts, next_value)
            next_value = next_value * (1.0 - terminated[:, None])

            rec = {
                "obs": obs,
                "actions": actions,
                "mu": mu,
                "sigma": jnp.broadcast_to(log_sigma, mu.shape),
                "neglogp": neglogp,
                "values": value,
                "rewards": rewards[:, None],
                "dones": dones,
                "next_values": next_value,
                "rand_action_mask": rand_mask,
            }
            rec = self._record_step(ts, env_state, roll, rec, infos)
            return (ts, env_state, roll), rec

        roll0 = self._init_rollout_carry(ts, env_state)
        (ts, env_state, roll), batch = jax.lax.scan(
            step_fn, (ts, env_state, roll0), None, length=self.horizon_length
        )
        return ts, env_state, roll, batch

    # -- GAE (reference discount_values, common_agent.py:437-449) --------------

    def _discount_values(self, dones, values, rewards, next_values):
        def scan_fn(lastgaelam, xs):
            done, value, reward, next_value = xs
            not_done = (1.0 - done)[:, None]
            delta = reward + self.gamma * next_value - value
            lastgaelam = delta + self.gamma * self.tau * not_done * lastgaelam
            return lastgaelam, lastgaelam

        init = jnp.zeros_like(values[0])
        _, advs = jax.lax.scan(
            scan_fn, init, (dones, values, rewards, next_values), reverse=True
        )
        return advs

    # -- rewards hook (AMP/ASE override) ---------------------------------------

    def _process_rewards(self, ts: TrainState, batch) -> Tuple[TrainState, Dict]:
        return ts, batch

    def _prepare_extra_dataset(self, ts, batch, dataset):
        return ts, dataset

    # -- losses ----------------------------------------------------------------

    def _actor_loss(self, old_neglogp, neglogp, advantage):
        ratio = jnp.exp(old_neglogp - neglogp)
        surr1 = advantage * ratio
        surr2 = advantage * jnp.clip(ratio, 1.0 - self.e_clip, 1.0 + self.e_clip)
        a_loss = jnp.maximum(-surr1, -surr2)
        clipped = (jnp.abs(ratio - 1.0) > self.e_clip).astype(jnp.float32)
        return a_loss, clipped

    def _critic_loss(self, old_values, values, returns):
        return jnp.square(returns - values)

    def _bound_loss(self, mu):
        if self.bounds_loss_coef == 0:
            return jnp.zeros(mu.shape[:-1])
        soft = 1.0
        hi = jnp.square(jnp.maximum(mu - soft, 0.0))
        lo = jnp.square(jnp.minimum(mu + soft, 0.0))
        return jnp.sum(hi + lo, axis=-1)

    def _loss(self, params, ts: TrainState, mb: Dict[str, jnp.ndarray]):
        """Minibatch loss; subclasses extend via _extra_loss."""
        obs_n = mb["obs_n"]
        mu, log_sigma = self._actor_sigma(params, obs_n, mb)
        values = self._critic(params, obs_n, mb)
        neglogp = self._neglogp(mb["actions"], mu, log_sigma)

        a_loss, a_clipped = self._actor_loss(mb["neglogp"], neglogp, mb["advantages"])
        c_loss = self._critic_loss(mb["values"], values, mb["returns"])
        b_loss = self._bound_loss(mu)
        entropy = self._entropy(log_sigma)

        rmask = mb["rand_action_mask"]
        rsum = jnp.maximum(jnp.sum(rmask), 1.0)
        a_loss_m = jnp.sum(rmask * a_loss) / rsum
        b_loss_m = jnp.sum(rmask * b_loss) / rsum
        ent_m = jnp.sum(rmask * entropy) / rsum
        c_loss_m = jnp.mean(c_loss)

        loss = (
            a_loss_m
            + self.critic_coef * c_loss_m
            - self.entropy_coef * ent_m
            + self.bounds_loss_coef * b_loss_m
        )

        info = {
            "a_loss": a_loss_m,
            "c_loss": c_loss_m,
            "b_loss": b_loss_m,
            "entropy": ent_m,
            "clip_frac": jnp.sum(rmask * a_clipped) / rsum,
            "mu": mu,
            "sigma": log_sigma,
        }
        loss, info = self._extra_loss(loss, params, ts, mb, info)
        return loss, info

    def _extra_loss(self, loss, params, ts, mb, info):
        return loss, info

    # -- dataset ---------------------------------------------------------------

    def _prepare_dataset(self, ts: TrainState, batch):
        T, B = self.horizon_length, self.num_actors

        def flat(x):
            return x.reshape((T * B,) + x.shape[2:])

        values = flat(batch["values"])
        returns = flat(batch["returns"])

        advantages = jnp.sum(returns - values, axis=1)
        rmask = flat(batch["rand_action_mask"])
        if self.normalize_advantage:
            advantages = self._normalize_adv(advantages, rmask)

        if self.normalize_value:
            vrms = ts.value_rms.update(values).update(returns)
            ts = ts.replace(value_rms=vrms)
            values = vrms.normalize(values, clip=jnp.inf)
            returns = vrms.normalize(returns, clip=jnp.inf)

        # obs stays raw here; _preproc_minibatch updates obs_rms with each
        # minibatch and normalizes with the fresh stats, matching the
        # reference's train-mode RunningMeanStd forwards (updates once per
        # minibatch per mini-epoch, not once per batch).
        dataset = {
            "obs_n": flat(batch["obs"]),
            "actions": flat(batch["actions"]),
            "neglogp": flat(batch["neglogp"]),
            "values": values,
            "returns": returns,
            "advantages": advantages,
            "mu": flat(batch["mu"]),
            "sigma": flat(batch["sigma"]),
            "rand_action_mask": rmask,
        }
        ts, dataset = self._prepare_extra_dataset(ts, batch, dataset)
        return ts, dataset

    def _normalize_adv(self, advantages, mask):
        """Masked advantage normalization (torch_ext.normalization_with_masks)."""
        msum = jnp.maximum(jnp.sum(mask), 1.0)
        mean = jnp.sum(advantages * mask) / msum
        var = jnp.sum(mask * jnp.square(advantages - mean)) / msum
        return (advantages - mean) / (jnp.sqrt(var) + 1e-8)

    # -- the jitted epoch (two phases: rollout/play and update, which keeps
    # the compiled modules tractable and restores the reference's
    # play_time/update_time split) ---------------------------------------------

    def _rollout_phase_impl(self, ts: TrainState, env_state):
        ts, env_state, roll, batch = self._rollout(ts, env_state)
        ts = self._post_rollout(ts, roll)

        ts, batch = self._process_rewards(ts, batch)

        advs = self._discount_values(
            batch["dones"], batch["values"], batch["rewards"], batch["next_values"]
        )
        batch["returns"] = advs + batch["values"]

        ts, dataset = self._prepare_dataset(ts, batch)

        roll_metrics = {"reward_mean": jnp.mean(batch["rewards"])}
        # style/skill reward curves (reference logs disc_reward_mean /
        # enc_reward_mean per epoch, amp_agent.py:297, ase_agent.py:470)
        for k in ("disc_rewards", "enc_rewards"):
            if k in batch:
                roll_metrics[k[:-1] + "_mean"] = jnp.mean(batch[k])
        ts = ts.replace(epoch=ts.epoch + 1, frame=ts.frame + self.batch_size)
        ts = self._post_epoch(ts, batch)
        return ts, env_state, dataset, roll_metrics

    def _minibatch_rows(self):
        """Hook: per-field row counts smaller than the minibatch. Fields
        listed here are gathered with only the first N permuted indices —
        the minibatch row-gathers dominate update-phase time on TPU, and
        e.g. the AMP 1400-dim fields only ever use amp_minibatch rows."""
        return {}

    def _update_phase_impl(self, ts: TrainState, dataset):
        mb_rows = self._minibatch_rows()
        # Pack every full-row float field into ONE (N, D) matrix so each
        # minibatch issues a single row-gather instead of ~10 per-field
        # gathers (row gathers are dispatch-bound on TPU — same lesson as
        # the reset pack and the packed motion-frame gather). The wide
        # mb_rows fields (AMP 1400-dim trio) stay per-field: they gather
        # fewer rows, and packing them would copy ~2 GB of HBM.
        pack_keys = [
            k for k, v in dataset.items()
            if k not in mb_rows and jnp.issubdtype(v.dtype, jnp.floating)
        ]
        # one packed matrix per dtype: mixing dtypes in a single concatenate
        # would silently upcast (and bf16 fields falling back to per-field
        # gathers would be an invisible perf regression)
        by_dtype: Dict[Any, list] = {}
        for k in pack_keys:
            by_dtype.setdefault(dataset[k].dtype, []).append(k)
        cols = {}   # key -> (dtype, start, stop, trailing shape)
        packs = {}  # dtype -> (N, D) matrix
        for dt, keys in by_dtype.items():
            off = 0
            for k in keys:
                v = dataset[k]
                d = 1
                for s in v.shape[1:]:
                    d *= s
                cols[k] = (dt, off, off + d, v.shape[1:])
                off += d
            packs[dt] = jnp.concatenate(
                [dataset[k].reshape(dataset[k].shape[0], -1) for k in keys],
                axis=1)
        rest = {k: v for k, v in dataset.items() if k not in cols}

        def minibatch_update(carry, idx):
            ts = carry
            # advance the PRNG once per minibatch so losses that draw samples
            # (e.g. ASE diversity latents via fold_in(ts.rng, ...)) get fresh
            # randomness every minibatch, matching the reference's per-batch
            # latent sampling (ase_agent._diversity_loss).
            rng, _ = jax.random.split(ts.rng)
            ts = ts.replace(rng=rng)
            subs = {dt: p[idx] for dt, p in packs.items()}
            mb = {
                k: subs[dt][:, a:b].reshape((idx.shape[0],) + shp)
                for k, (dt, a, b, shp) in cols.items()
            }
            mb.update({
                k: (x[idx] if k not in mb_rows else x[idx[: mb_rows[k]]])
                for k, x in rest.items()
            })
            ts, mb = self._preproc_minibatch(ts, mb)
            (loss, info), grads = jax.value_and_grad(self._loss, has_aux=True)(
                ts.params, ts, mb
            )
            updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
            params = optax.apply_updates(ts.params, updates)
            kl = self._policy_kl(info["mu"], info["sigma"], mb["mu"], mb["sigma"])
            if self.lr_schedule == "adaptive":
                opt_state = self._adapt_lr(opt_state, kl)
            ts = ts.replace(params=params, opt_state=opt_state)
            metrics = {k: v for k, v in info.items() if jnp.ndim(v) == 0}
            metrics["kl"] = kl
            metrics["loss"] = loss
            return ts, metrics

        def mini_epoch(carry, _):
            ts = carry
            rng, k = jax.random.split(ts.rng)
            ts = ts.replace(rng=rng)
            perm = jax.random.permutation(k, self.batch_size)
            idxs = perm.reshape(self.num_minibatches, self.minibatch_size)
            ts, metrics = jax.lax.scan(minibatch_update, ts, idxs)
            return ts, metrics

        ts, metrics = jax.lax.scan(mini_epoch, ts, None, length=self.mini_epochs)
        ts = self._post_update(ts, dataset)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        # windowed means: before the window fills, unwritten slots are zero,
        # so dividing by min(total, K) gives the exact mean of stored games
        n_games = jnp.clip(ts.extra["game_total"], 1.0, float(self.games_to_track))
        metrics["game_reward_mean"] = jnp.sum(ts.extra["game_rewards_buf"]) / n_games
        metrics["game_length_mean"] = jnp.sum(ts.extra["game_lengths_buf"]) / n_games
        metrics["games_played"] = ts.extra["game_total"]
        # windowed success rate over the last K games (0 unless the task
        # publishes aux['successes']; reference consecutive_successes meter)
        metrics["consecutive_successes_mean"] = (
            jnp.sum(ts.extra["game_success_buf"]) / n_games)
        return ts, metrics

    def _train_epoch_impl(self, ts: TrainState, env_state):
        """Single-module epoch (used by the multichip dryrun)."""
        ts, env_state, dataset, rmetrics = self._rollout_phase_impl(ts, env_state)
        ts, metrics = self._update_phase_impl(ts, dataset)
        metrics.update(rmetrics)
        return ts, env_state, metrics

    def _adapt_lr(self, opt_state, kl):
        """KL-threshold LR adaptation (rl_games AdaptiveScheduler: /1.5 when
        KL > 2·threshold, ×1.5 when KL < threshold/2, clamped to [1e-6, 1e-2])."""
        is_chained = not hasattr(opt_state, "hyperparams")
        inner = opt_state[-1] if is_chained else opt_state
        lr = inner.hyperparams["learning_rate"]
        lr = jnp.where(kl > 2.0 * self.kl_threshold, jnp.maximum(lr / 1.5, 1e-6), lr)
        lr = jnp.where(kl < 0.5 * self.kl_threshold, jnp.minimum(lr * 1.5, 1e-2), lr)
        inner = inner._replace(hyperparams={**inner.hyperparams, "learning_rate": lr})
        if is_chained:
            return opt_state[:-1] + (inner,)
        return inner

    def _post_rollout(self, ts: TrainState, roll) -> TrainState:
        """Hook: persist rollout-carry state across epochs (ASE latents)."""
        return ts

    def _preproc_minibatch(self, ts, mb):
        """Per-minibatch RMS updates (reference: RunningMeanStd in train mode
        updates on every training forward — common_agent.py:353-435)."""
        if self.normalize_input:
            rms = ts.obs_rms.update(mb["obs_n"])
            ts = ts.replace(obs_rms=rms)
            mb = dict(mb)
            mb["obs_n"] = rms.normalize(mb["obs_n"])
        return ts, mb

    def _post_epoch(self, ts: TrainState, batch) -> TrainState:
        return ts

    def _post_update(self, ts: TrainState, dataset) -> TrainState:
        """Hook after the minibatch update loop (AMP replay store lands here,
        matching the reference's post-update ordering — the replay buffer the
        minibatches sampled from must not contain this epoch's rollout,
        reference amp_agent.py:257,579-593)."""
        return ts

    @property
    def train_epoch(self):
        """Jitted train epoch.

        Default: one fused module (rollout+update) — measured fastest on TPU
        (the split variant pays inter-phase buffer copies). Set
        ASE_TPU_SPLIT_EPOCH=1 for the two-phase variant (smaller modules,
        faster iteration during development)."""
        if self._train_epoch_jit is None:
            if os.environ.get("ASE_TPU_SPLIT_EPOCH", "0") == "1":
                roll_jit = jax.jit(self._rollout_phase_impl, donate_argnums=(0, 1))
                upd_jit = jax.jit(self._update_phase_impl, donate_argnums=(0, 1))

                def epoch(ts, env_state):
                    ts, env_state, dataset, rmetrics = roll_jit(ts, env_state)
                    ts, metrics = upd_jit(ts, dataset)
                    metrics.update(rmetrics)
                    return ts, env_state, metrics

                self._train_epoch_jit = epoch
            else:
                self._train_epoch_jit = jax.jit(
                    self._train_epoch_impl, donate_argnums=(0, 1)
                )
        return self._train_epoch_jit

    # -- outer loop (host side: logging, checkpoints) ---------------------------

    def setup_mesh(self, mesh=None):
        """Enable data-parallel env sharding over a device mesh.

        TPU-native equivalent of the reference's Horovod mode (reference
        ``run.py:36-50``, grad allreduce at ``common_agent.py:205-229``):
        train state is replicated, env state / rollout tensors are sharded
        over the ``env`` mesh axis, and XLA's SPMD partitioner inserts the
        gradient/statistic all-reduces inside the jitted epoch — the
        semantics are bit-identical to the single-device program.
        """
        from ase_tpu.parallel import mesh as mesh_lib

        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()

    def _place_states(self, ts, env_state):
        """Apply mesh placement (no-op without a mesh)."""
        if self.mesh is None or self.mesh.size <= 1:
            return ts, env_state
        from ase_tpu.parallel import mesh as mesh_lib

        assert self.num_actors % self.mesh.size == 0, (
            f"numEnvs {self.num_actors} % devices {self.mesh.size} != 0"
        )
        ts = mesh_lib.replicate_state(self.mesh, ts)
        env_state = mesh_lib.shard_env_state(self.mesh, env_state, self.num_actors)
        return ts, env_state

    def train(self, max_epochs: int = None, writer=None, log_every: int = 1,
              restore_path: str = None):
        from ase_tpu.learning import checkpoint as ckpt

        max_epochs = max_epochs or self.max_epochs
        rng = jax.random.PRNGKey(int(self.cfg_train["params"].get("seed", 0)))
        k1, k2 = jax.random.split(rng)
        ts = self.init_train_state(k1)
        env_state = self.env.initial_state(k2)

        start_epoch = 0
        if restore_path:
            # training resume (reference config.py:97-104 / rl_games
            # restore): the full TrainState pytree — params, optimizer state,
            # normalizer statistics, replay buffers in extra, epoch/frame
            # counters and RNG — comes back from the checkpoint; epoch
            # counting continues where it stopped. Env state is freshly
            # reset (the reference cannot restore PhysX state either).
            # strict resume: only the known-transient subtrees (excluded
            # demo/replay buffers) and fields newer than the checkpoint may
            # be missing — anything else (wrong checkpoint, renamed field,
            # different network width) raises instead of silently keeping
            # freshly-initialized template values
            # fields newer than the checkpoint format may be absent
            new_fields = ("best_mean_rewards", "game_success_buf")
            ts = ckpt.restore(
                restore_path, ts, strict=True,
                allow_missing=self._ckpt_exclude() + new_fields,
            )
            start_epoch = int(np.asarray(ts.epoch))
            self._best_mean_rewards = float(
                np.asarray(ts.extra["best_mean_rewards"]))
            print(f"resumed from {restore_path} at epoch {start_epoch}", flush=True)

        ts, env_state = self._place_states(ts, env_state)

        # multi-host: only process 0 writes TB (reference rank-0 logging,
        # common_agent.py:109); every process prints its own fps. Checkpoint
        # saves run on ALL processes — fetching globally-sharded leaves is a
        # collective — and ckpt.save itself writes only from process 0.
        if jax.process_index() != 0:
            writer = None

        os.makedirs(self.output_dir, exist_ok=True)
        name = self.config.get("name", "Humanoid")
        start = time.time()
        # jax.profiler trace hook (SURVEY §5.1): ASE_TPU_PROFILE=<epoch> traces
        # that epoch into <output>/profile for the TensorBoard trace viewer.
        profile_epoch = int(os.environ.get("ASE_TPU_PROFILE", "-1"))
        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            if epoch == profile_epoch:
                jax.profiler.start_trace(os.path.join(self.output_dir, "profile"))
            ts, env_state, metrics = self.train_epoch(ts, env_state)
            if epoch == profile_epoch:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                    metrics,
                )
                jax.profiler.stop_trace()
            metrics = jax.device_get(metrics)
            dt_wall = time.time() - t0
            fps = self.batch_size / dt_wall
            if epoch % log_every == 0:
                msg = " ".join(
                    f"{k}:{float(np.asarray(v)):.4f}" for k, v in sorted(metrics.items())
                    if np.ndim(v) == 0
                )
                print(f"epoch {epoch} fps:{fps:.0f} {msg}", flush=True)
            if writer is not None:
                frame = int(jax.device_get(ts.frame))
                for k, v in metrics.items():
                    if np.ndim(v) == 0:
                        writer.add_scalar(f"train/{k}", float(v), frame)
                writer.add_scalar("performance/total_fps", fps, frame)
            if self.save_frequency > 0 and (epoch + 1) % self.save_frequency == 0:
                ckpt.save(os.path.join(self.output_dir, f"{name}.ckpt"),
                          self._stamp_best(ts), exclude=self._ckpt_exclude())
                if self._save_intermediate:
                    ckpt.save(
                        os.path.join(self.output_dir, f"{name}_{epoch + 1:08d}.ckpt"),
                        self._stamp_best(ts),
                    )
            # best-by-mean-reward checkpoint (reference save_best_after)
            mean_rew = float(np.asarray(metrics.get("game_reward_mean", 0.0)))
            if (
                epoch >= self.save_best_after
                and float(np.asarray(metrics.get("games_played", 0.0))) > 0
                and mean_rew > getattr(self, "_best_mean_rewards", -1e9)
            ):
                self._best_mean_rewards = mean_rew
                ckpt.save(os.path.join(self.output_dir, f"{name}_best.ckpt"),
                          self._stamp_best(ts), exclude=self._ckpt_exclude())
        ckpt.save(os.path.join(self.output_dir, f"{name}.ckpt"),
                  self._stamp_best(ts), exclude=self._ckpt_exclude())
        print(f"training done in {time.time()-start:.1f}s")
        return ts, env_state
