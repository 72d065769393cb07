"""AMPAgent: PPO + adversarial motion prior discriminator.

Capability-parity with reference ``ase/learning/amp_agent.py``: discriminator
trained on (agent, replay, demo) AMP-observation batches with BCE loss, logit
regularization, demo gradient penalty and weight decay
(amp_agent.py:442-479); style reward ``-log(1-σ(D))`` scaled and combined
with the task reward (540-577); demo and replay buffers live on device and
are updated inside the jitted epoch; ε-greedy per-env deterministic action
mixture with the exponential env-index profile (424-435).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.learning.common_agent import CommonAgent, TrainState
from ase_tpu.learning.replay_buffer import ReplayBuffer
from ase_tpu.learning.running_mean_std import RunningMeanStd
from ase_tpu.models import networks


class AMPAgent(CommonAgent):
    def __init__(self, env, cfg_train, output_dir="output"):
        config = cfg_train["params"]["config"]
        self._task_reward_w = float(config["task_reward_w"])
        self._disc_reward_w = float(config["disc_reward_w"])
        self._amp_batch_size = int(config["amp_batch_size"])
        self._amp_minibatch_size = int(config["amp_minibatch_size"])
        self._disc_coef = float(config["disc_coef"])
        self._disc_logit_reg = float(config["disc_logit_reg"])
        self._disc_grad_penalty = float(config["disc_grad_penalty"])
        self._disc_weight_decay = float(config["disc_weight_decay"])
        self._disc_reward_scale = float(config["disc_reward_scale"])
        self._normalize_amp_input = bool(config.get("normalize_amp_input", True))
        self._enable_eps_greedy = bool(config.get("enable_eps_greedy", False))
        self._amp_obs_demo_buffer_size = int(config["amp_obs_demo_buffer_size"])
        self._amp_replay_buffer_size = int(config["amp_replay_buffer_size"])
        self._amp_replay_keep_prob = float(config["amp_replay_keep_prob"])
        # A/B escape (docs/FLAGS.md): =1 materializes the (n, 1400)
        # demo/replay sample tensors up-front and uses the full-batch masked
        # replay store, the pre-round-4 layout
        self._materialized_amp = os.environ.get(
            "ASE_TPU_MATERIALIZED_AMP", "0") == "1"

        self.amp_obs_dim = env.amp_obs_size()
        if self._amp_minibatch_size > int(config["minibatch_size"]):
            # small-scale debug runs: shrink the AMP minibatch with the PPO one
            self._amp_minibatch_size = int(config["minibatch_size"])

        super().__init__(env, cfg_train, output_dir)
        self._build_rand_action_probs()

    # -- network --------------------------------------------------------------

    def _build_network(self):
        return networks.build_network(
            "amp", self.cfg_train["params"], self.obs_dim, self.action_dim,
            amp_obs_dim=self.amp_obs_dim,
        )

    def _net_init_args(self, rng):
        return (jnp.zeros((1, self.obs_dim)), jnp.zeros((1, self.amp_obs_dim)))

    def _actor_sigma(self, params, obs_n, extra):
        return self.network.apply(params, obs_n, method=self.network.eval_actor)

    def _critic(self, params, obs_n, extra):
        return self.network.apply(params, obs_n, method=self.network.eval_critic)

    def _eval_disc(self, params, amp_obs_n):
        return self.network.apply(params, amp_obs_n, method=self.network.eval_disc)

    # -- eps-greedy (reference _build_rand_action_probs) -----------------------

    def _build_rand_action_probs(self):
        n = self.num_actors
        env_ids = np.arange(n, dtype=np.float32)
        probs = 1.0 - np.exp(10.0 * (env_ids / (n - 1.0) - 1.0))
        probs[0] = 1.0
        probs[-1] = 0.0
        if not self._enable_eps_greedy:
            probs[:] = 1.0
        self._rand_action_probs = jnp.asarray(probs)

    def _rand_action_mask(self, ts, rng):
        return (
            jax.random.uniform(rng, (self.num_actors,)) < self._rand_action_probs
        ).astype(jnp.float32)

    # -- extra state ------------------------------------------------------------

    def _transient_extra(self) -> tuple:
        # demo buffer is refilled from the motion library at init; the agent
        # replay buffer re-warms within a few epochs (reference rl_games
        # checkpoints persist neither) — dropping them cuts checkpoints from
        # ~2.3 GB to ~50 MB at production buffer sizes
        return ("extra['demo_buffer']", "extra['replay_buffer']")

    def _init_extra(self, rng) -> Dict[str, Any]:
        extra = super()._init_extra(rng)
        if self._normalize_amp_input:
            extra["amp_rms"] = RunningMeanStd.create((self.amp_obs_dim,))
        extra["demo_buffer"] = ReplayBuffer.create(
            self._amp_obs_demo_buffer_size, self.amp_obs_dim
        )
        extra["replay_buffer"] = ReplayBuffer.create(
            self._amp_replay_buffer_size, self.amp_obs_dim
        )
        return extra

    def init_train_state(self, rng):
        ts = super().init_train_state(rng)
        return self._init_amp_demo_buf(ts)

    def _init_amp_demo_buf(self, ts: TrainState) -> TrainState:
        """Pre-fill the demo buffer (reference amp_agent.py:520-528).

        One small jitted fetch+store step, invoked repeatedly with buffer
        donation — keeps the compiled module tiny and the 1GB buffer updated
        in place."""
        chunk = min(self._amp_obs_demo_buffer_size, 16384)
        n_chunks = int(np.ceil(self._amp_obs_demo_buffer_size / chunk))

        @partial(jax.jit, donate_argnums=(0,))
        def fill_step(buf, rng):
            rng, k = jax.random.split(rng)
            demo = self.env.fetch_amp_obs_demo(k, chunk)
            return buf.store(demo), rng

        buf = ts.extra["demo_buffer"]
        rng = ts.rng
        for _ in range(n_chunks):
            buf, rng = fill_step(buf, rng)
        extra = dict(ts.extra)
        extra["demo_buffer"] = buf
        return ts.replace(rng=rng, extra=extra)

    # -- amp preprocessing -------------------------------------------------------

    def _norm_amp(self, ts: TrainState, amp_obs):
        if not self._normalize_amp_input:
            return amp_obs
        return ts.extra["amp_rms"].normalize(amp_obs)

    # -- record amp obs during rollout ------------------------------------------

    def _record_step(self, ts, env_state, roll, rec, infos):
        rec = super()._record_step(ts, env_state, roll, rec, infos)
        rec["amp_obs"] = self.env.amp_obs_flat(env_state)
        return rec

    # -- rewards -----------------------------------------------------------------

    def _calc_disc_rewards(self, ts: TrainState, amp_obs):
        logits = self._eval_disc(ts.params, self._norm_amp(ts, amp_obs))
        prob = jax.nn.sigmoid(logits)
        r = -jnp.log(jnp.maximum(1.0 - prob, 0.0001))
        return r * self._disc_reward_scale

    def _calc_amp_rewards(self, ts, batch) -> Dict[str, jnp.ndarray]:
        return {"disc_rewards": self._calc_disc_rewards(ts, batch["amp_obs"])}

    def _combine_rewards(self, task_rewards, amp_rewards):
        return (
            self._task_reward_w * task_rewards
            + self._disc_reward_w * amp_rewards["disc_rewards"]
        )

    def _process_rewards(self, ts, batch):
        amp_rewards = self._calc_amp_rewards(ts, batch)
        batch["rewards"] = self._combine_rewards(batch["rewards"], amp_rewards)
        for k, v in amp_rewards.items():
            batch[k] = v
        return ts, batch

    # -- dataset extras ----------------------------------------------------------

    def _prepare_extra_dataset(self, ts, batch, dataset):
        ts, dataset = super()._prepare_extra_dataset(ts, batch, dataset)
        T, B = self.horizon_length, self.num_actors
        amp_obs = batch["amp_obs"].reshape(T * B, -1)
        dataset["amp_obs"] = amp_obs

        rng, k1, k2, k3 = jax.random.split(ts.rng, 4)
        ts = ts.replace(rng=rng)

        # refresh demo buffer with a fresh fetch (reference _update_amp_demos)
        extra = dict(ts.extra)
        demo_new = self.env.fetch_amp_obs_demo(k1, self._amp_batch_size)
        extra["demo_buffer"] = extra["demo_buffer"].store(demo_new)

        n = amp_obs.shape[0]
        demo_buf, demo_idx = extra["demo_buffer"].sample_cursor_idx(k2, n)
        extra["demo_buffer"] = demo_buf
        replay, replay_idx = extra["replay_buffer"].sample_cursor_idx(k3, n)
        extra["replay_buffer"] = replay
        if self._materialized_amp:
            # A/B escape: materialize the (n, 1400) demo/replay sample
            # tensors up-front (the pre-round-4 layout; same rows)
            dataset["amp_obs_demo"] = demo_buf.data[demo_idx]
            dataset["amp_obs_replay"] = jnp.where(
                replay.total_count > 0, replay.data[replay_idx], amp_obs)
        else:
            # store the cursor draws as indices; each minibatch gathers its
            # amp_minibatch rows straight from the buffers in
            # _preproc_minibatch. Same rows in the same order — but the two
            # (n, 1400) sample tensors (1.5 GB at bench shapes) are never
            # built, and the full-buffer row gather that forced XLA to
            # relayout the 1.1 GB buffers column-major each epoch is gone.
            dataset["amp_obs_demo_idx"] = demo_idx
            dataset["amp_obs_replay_idx"] = replay_idx
        ts = ts.replace(extra=extra)
        return ts, dataset

    def _replay_store_k_max(self, n: int) -> int:
        """Row budget for the compact replay store: 4x the expected
        Binomial(n, keep_prob) keeps, floored at 256, capped at n."""
        return max(256, min(n, 4 * int(self._amp_replay_keep_prob * n + 1)))

    def _post_update(self, ts, dataset):
        ts = super()._post_update(ts, dataset)
        # store rollout amp obs into the replay buffer with keep-prob masking.
        # This runs AFTER the minibatch update loop (reference
        # amp_agent.py:257 calls _store_replay_amp_obs at the end of
        # train_epoch): the per-minibatch replay gathers must read the
        # pre-store buffer — storing in _post_epoch (pre-update) made the
        # lazy index path sample this epoch's rollout rows while the
        # materialized path sampled the old buffer.
        amp_obs = dataset["amp_obs"]
        rng, k = jax.random.split(ts.rng)
        buf = ts.extra["replay_buffer"]
        keep = jax.random.uniform(k, (amp_obs.shape[0],)) < self._amp_replay_keep_prob
        extra = dict(ts.extra)
        if self._materialized_amp:
            # A/B escape: the pre-round-4 full-batch masked store
            keep = jnp.where(buf.total_count > buf.capacity, keep, jnp.ones_like(keep))
            extra["replay_buffer"] = buf.store(amp_obs, mask=keep)
        else:
            # reference semantics (amp_agent.py:579-590): store everything
            # until the buffer has been filled once, then keep-prob subsample.
            # The fill branch runs for the first couple of epochs only; the
            # steady-state branch moves k_max rows instead of the whole
            # (n, 1400) rollout (~2 GB of HBM traffic to store ~n/100 rows).
            # store_compact silently drops valid rows past k_max, so k_max
            # must dominate the Binomial(n, p) keep count: 4x the mean (and
            # ≥256) puts the drop probability below the binomial tail at
            # ~exp(-n·p) for any n·p ≥ ~8 — test_learning.py
            # ::test_amp_replay_kmax_covers_binomial_tail guards the margin.
            k_max = self._replay_store_k_max(amp_obs.shape[0])
            extra["replay_buffer"] = jax.lax.cond(
                buf.total_count > buf.capacity,
                lambda b: b.store_compact(amp_obs, keep, k_max),
                lambda b: b.store(amp_obs),
                buf,
            )
        return ts.replace(rng=rng, extra=extra)

    # -- minibatch preprocessing (amp rms updates, reference train-mode calls) ---

    def _minibatch_rows(self):
        # the 1400-dim AMP fields only ever feed amp_minibatch-sized disc
        # batches — gathering full minibatch rows was the dominant
        # update-phase cost (row gathers are slow on TPU)
        rows = super()._minibatch_rows()
        n = self._amp_minibatch_size
        rows.update(amp_obs=n)
        if self._materialized_amp:
            rows.update(amp_obs_replay=n, amp_obs_demo=n)
        else:
            rows.update(amp_obs_replay_idx=n, amp_obs_demo_idx=n)
        return rows

    def _preproc_minibatch(self, ts, mb):
        ts, mb = super()._preproc_minibatch(ts, mb)
        n = self._amp_minibatch_size
        # one (3n, 1400) RMS update + normalize over [agent | replay | demo]
        # instead of three per-source chains: the Chan moment merge is
        # associative, so updating with the concat equals the sequential
        # updates (exact math; fp-order differs), and all three sources were
        # already normalized with the post-update stats. Slices alias the
        # concat, and the disc forward consumes rows [:2n] directly.
        a = mb["amp_obs"][:n]
        if self._materialized_amp:
            r, d = mb["amp_obs_replay"][:n], mb["amp_obs_demo"][:n]
        else:
            # gather this minibatch's demo/replay rows straight from the
            # device buffers via the cursor indices drawn in
            # _prepare_extra_dataset — same rows as materializing the full
            # sample tensors, without ever building them
            d = ts.extra["demo_buffer"].data[mb["amp_obs_demo_idx"][:n]]
            rbuf = ts.extra["replay_buffer"]
            r = jnp.where(rbuf.total_count > 0,
                          rbuf.data[mb["amp_obs_replay_idx"][:n]], a)
        cat = jnp.concatenate([a, r, d], axis=0)
        if self._normalize_amp_input:
            rms = ts.extra["amp_rms"].update(cat)
            extra = dict(ts.extra)
            extra["amp_rms"] = rms
            ts = ts.replace(extra=extra)
            cat = rms.normalize(cat)
        mb["amp_obs_ar_n"] = cat[: 2 * n]
        mb["amp_obs_n"] = cat[:n]
        mb["amp_obs_replay_n"] = cat[n : 2 * n]
        mb["amp_obs_demo_n"] = cat[2 * n :]
        return ts, mb

    # -- disc loss ----------------------------------------------------------------

    def _disc_weights(self, params):
        """Flattened disc MLP + logit kernels (reference get_disc_weights)."""
        p = params["params"]
        ws = []
        mlp = p["disc_mlp"]
        for layer in mlp.values():
            ws.append(jnp.ravel(layer["kernel"]))
        ws.append(jnp.ravel(p["disc_logits"]["kernel"]))
        return jnp.concatenate(ws)

    def _disc_logit_weights(self, params):
        return jnp.ravel(params["params"]["disc_logits"]["kernel"])

    def _bce_with_logits(self, logits, target):
        # mean over all elements, matching torch BCEWithLogitsLoss default
        return jnp.mean(
            jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    def _disc_loss(self, params, agent_logits, demo_logits_fn, demo_obs_n, info_prefix="disc"):
        # forward + input-gradient for the penalty (second-order through params)
        demo_logits, pullback = jax.vjp(demo_logits_fn, demo_obs_n)
        (demo_grad,) = pullback(jnp.ones_like(demo_logits))

        loss_agent = self._bce_with_logits(agent_logits, jnp.zeros_like(agent_logits))
        loss_demo = self._bce_with_logits(demo_logits, jnp.ones_like(demo_logits))
        loss = 0.5 * (loss_agent + loss_demo)

        logit_w = self._disc_logit_weights(params)
        logit_loss = jnp.sum(jnp.square(logit_w))
        loss = loss + self._disc_logit_reg * logit_loss

        grad_pen = jnp.mean(jnp.sum(jnp.square(demo_grad), axis=-1))
        loss = loss + self._disc_grad_penalty * grad_pen

        if self._disc_weight_decay != 0:
            w = self._disc_weights(params)
            loss = loss + self._disc_weight_decay * jnp.sum(jnp.square(w))

        info = {
            f"{info_prefix}_loss": loss,
            f"{info_prefix}_grad_penalty": grad_pen,
            f"{info_prefix}_logit_loss": logit_loss,
            f"{info_prefix}_agent_acc": jnp.mean((agent_logits < 0).astype(jnp.float32)),
            f"{info_prefix}_demo_acc": jnp.mean((demo_logits > 0).astype(jnp.float32)),
            f"{info_prefix}_agent_logit": jnp.mean(agent_logits),
            f"{info_prefix}_demo_logit": jnp.mean(demo_logits),
        }
        return loss, info

    def _extra_loss(self, loss, params, ts, mb, info):
        loss, info = super()._extra_loss(loss, params, ts, mb, info)
        # one disc forward on the concatenated agent+replay rows instead of
        # two half-batch chains: the loss/acc only ever see the concatenated
        # logits, so this is bit-identical semantics with half the kernels
        # (rows [:2n] of the preproc concat — no re-concatenation)
        agent_cat = self._eval_disc(params, mb["amp_obs_ar_n"])

        def demo_fn(x):
            return self._eval_disc(params, x)

        disc_loss, disc_info = self._disc_loss(params, agent_cat, demo_fn, mb["amp_obs_demo_n"])
        info.update(disc_info)
        return loss + self._disc_coef * disc_loss, info
