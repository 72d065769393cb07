"""ASEAgent: AMP + latent skill space (reference ``ase/learning/ase_agent.py``).

Adds the latent machinery: per-env latent z on the unit hypersphere resampled
every [latent_steps_min, latent_steps_max) control steps (ase_agent.py:
366-379), latent-conditioned actor/critic, encoder reward
``clamp_min(z·enc(amp_obs), 0)`` (404-411, 469-472), encoder loss with
optional weight decay / gradient penalty (413-443), and the diversity
objective pushing different z to different actions (445-467). Rewards combine
task/disc/enc with the configured weights (484-490).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.learning.amp_agent import AMPAgent
from ase_tpu.learning.common_agent import TrainState
from ase_tpu.models import networks


class ASEAgent(AMPAgent):
    def __init__(self, env, cfg_train, output_dir="output"):
        config = cfg_train["params"]["config"]
        self._latent_dim = int(config["latent_dim"])
        self._latent_steps_min = int(config.get("latent_steps_min", 1))
        self._latent_steps_max = int(config.get("latent_steps_max", 150))
        self._amp_diversity_bonus = float(config.get("amp_diversity_bonus", 0.0))
        self._amp_diversity_tar = float(config.get("amp_diversity_tar", 1.0))
        self._enc_coef = float(config["enc_coef"])
        self._enc_weight_decay = float(config.get("enc_weight_decay", 0.0))
        self._enc_reward_scale = float(config.get("enc_reward_scale", 1.0))
        self._enc_grad_penalty = float(config.get("enc_grad_penalty", 0.0))
        self._enc_reward_w = float(config["enc_reward_w"])
        super().__init__(env, cfg_train, output_dir)

    # -- network ---------------------------------------------------------------

    def _build_network(self):
        return networks.build_network(
            "ase", self.cfg_train["params"], self.obs_dim, self.action_dim,
            amp_obs_dim=self.amp_obs_dim, latent_dim=self._latent_dim,
        )

    def _net_init_args(self, rng):
        return (
            jnp.zeros((1, self.obs_dim)),
            jnp.zeros((1, self._latent_dim)),
            jnp.zeros((1, self.amp_obs_dim)),
        )

    def _actor_sigma(self, params, obs_n, extra):
        return self.network.apply(
            params, obs_n, extra["ase_latents"], method=self.network.eval_actor
        )

    def _critic(self, params, obs_n, extra):
        return self.network.apply(
            params, obs_n, extra["ase_latents"], method=self.network.eval_critic
        )

    def _eval_enc(self, params, amp_obs_n):
        return self.network.apply(params, amp_obs_n, method=self.network.eval_enc)

    # -- latent lifecycle (reference init_tensors / _update_latents) -----------

    def _init_rollout_carry(self, ts: TrainState, env_state) -> Dict[str, Any]:
        roll = super()._init_rollout_carry(ts, env_state)
        roll["ase_latents"] = ts.extra["ase_latents"]
        roll["latent_reset_steps"] = ts.extra["latent_reset_steps"]
        return roll

    def _init_extra(self, rng) -> Dict[str, Any]:
        extra = super()._init_extra(rng)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 17))
        extra["ase_latents"] = networks.sample_latents(
            k1, self.num_actors, self._latent_dim
        )
        extra["latent_reset_steps"] = jax.random.randint(
            k2, (self.num_actors,), self._latent_steps_min, self._latent_steps_max
        )
        return extra

    def _pre_rollout_step(self, ts: TrainState, env_state, roll):
        ts, env_state, roll = super()._pre_rollout_step(ts, env_state, roll)
        B = self.num_actors
        rng, k1, k2, k3, k4 = jax.random.split(ts.rng, 5)
        ts = ts.replace(rng=rng)

        z = roll["ase_latents"]
        steps = roll["latent_reset_steps"]

        # envs that were just reset get fresh latents + schedules
        just_reset = env_state.progress == 0
        z_new = networks.sample_latents(k1, B, self._latent_dim)
        s_new = jax.random.randint(
            k2, (B,), self._latent_steps_min, self._latent_steps_max
        )
        z = jnp.where(just_reset[:, None], z_new, z)
        steps = jnp.where(just_reset, s_new, steps)

        # scheduled resample (reference _update_latents)
        need = steps <= env_state.progress
        z_new2 = networks.sample_latents(k3, B, self._latent_dim)
        s_inc = jax.random.randint(
            k4, (B,), self._latent_steps_min, self._latent_steps_max
        )
        z = jnp.where(need[:, None], z_new2, z)
        steps = jnp.where(need, steps + s_inc, steps)

        roll = dict(roll)
        roll["ase_latents"] = z
        roll["latent_reset_steps"] = steps
        return ts, env_state, roll

    def _record_step(self, ts, env_state, roll, rec, infos):
        rec = super()._record_step(ts, env_state, roll, rec, infos)
        rec["ase_latents"] = roll["ase_latents"]
        return rec

    def _post_rollout(self, ts, roll):
        ts = super()._post_rollout(ts, roll)
        # persist latent state + schedules across epochs
        extra = dict(ts.extra)
        extra["ase_latents"] = roll["ase_latents"]
        extra["latent_reset_steps"] = roll["latent_reset_steps"]
        return ts.replace(extra=extra)

    # -- rewards ----------------------------------------------------------------

    def _calc_enc_error(self, enc_pred, latents):
        return -jnp.sum(enc_pred * latents, axis=-1, keepdims=True)

    def _calc_enc_rewards(self, ts, amp_obs, latents):
        enc_pred = self._eval_enc(ts.params, self._norm_amp(ts, amp_obs))
        err = self._calc_enc_error(enc_pred, latents)
        return jnp.maximum(-err, 0.0) * self._enc_reward_scale

    def _calc_amp_rewards(self, ts, batch):
        out = super()._calc_amp_rewards(ts, batch)
        out["enc_rewards"] = self._calc_enc_rewards(
            ts, batch["amp_obs"], batch["ase_latents"]
        )
        return out

    def _combine_rewards(self, task_rewards, amp_rewards):
        return (
            self._task_reward_w * task_rewards
            + self._disc_reward_w * amp_rewards["disc_rewards"]
            + self._enc_reward_w * amp_rewards["enc_rewards"]
        )

    # -- dataset ----------------------------------------------------------------

    def _prepare_extra_dataset(self, ts, batch, dataset):
        ts, dataset = super()._prepare_extra_dataset(ts, batch, dataset)
        T, B = self.horizon_length, self.num_actors
        dataset["ase_latents"] = batch["ase_latents"].reshape(T * B, -1)
        return ts, dataset

    # -- losses -----------------------------------------------------------------

    def _enc_weights(self, params):
        p = params["params"]
        ws = []
        trunk = p["enc_mlp"] if "enc_mlp" in p else p["disc_mlp"]
        for layer in trunk.values():
            ws.append(jnp.ravel(layer["kernel"]))
        ws.append(jnp.ravel(p["enc_head"]["kernel"]))
        return jnp.concatenate(ws)

    def _extra_loss(self, loss, params, ts, mb, info):
        loss, info = super()._extra_loss(loss, params, ts, mb, info)

        # encoder loss on the amp minibatch (reference _enc_loss)
        enc_latents = mb["ase_latents"][: self._amp_minibatch_size]

        def enc_err_fn(amp_obs_n):
            enc_pred = self._eval_enc(params, amp_obs_n)
            return self._calc_enc_error(enc_pred, enc_latents)

        if self._enc_grad_penalty != 0:
            err, pullback = jax.vjp(enc_err_fn, mb["amp_obs_n"])
            (g,) = pullback(jnp.ones_like(err))
            enc_grad_pen = jnp.mean(jnp.sum(jnp.square(g), axis=-1))
        else:
            err = enc_err_fn(mb["amp_obs_n"])
            enc_grad_pen = 0.0
        enc_loss = jnp.mean(err)
        if self._enc_weight_decay != 0:
            enc_loss = enc_loss + self._enc_weight_decay * jnp.sum(
                jnp.square(self._enc_weights(params))
            )
        if self._enc_grad_penalty != 0:
            enc_loss = enc_loss + self._enc_grad_penalty * enc_grad_pen
        info["enc_loss"] = enc_loss
        loss = loss + self._enc_coef * enc_loss

        # diversity objective (reference _diversity_loss)
        if self._amp_diversity_bonus != 0:
            rng = jax.random.fold_in(ts.rng, 23)
            n = mb["obs_n"].shape[0]
            new_z = networks.sample_latents(rng, n, self._latent_dim)
            mu_new, _ = self.network.apply(
                params, mb["obs_n"], new_z, method=self.network.eval_actor
            )
            mu_old = info["mu"]
            a_diff = jnp.mean(
                jnp.square(jnp.clip(mu_old, -1, 1) - jnp.clip(mu_new, -1, 1)), axis=-1
            )
            z_diff = 0.5 - 0.5 * jnp.sum(new_z * mb["ase_latents"], axis=-1)
            bonus = a_diff / (z_diff + 1e-5)
            div_loss = jnp.square(self._amp_diversity_tar - bonus)
            rmask = mb["rand_action_mask"]
            div_loss = jnp.sum(rmask * div_loss) / jnp.maximum(jnp.sum(rmask), 1.0)
            info["diversity_loss"] = div_loss
            loss = loss + self._amp_diversity_bonus * div_loss

        return loss, info
