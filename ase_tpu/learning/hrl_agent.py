"""HRLAgent: high-level PPO driving a frozen pretrained ASE low-level
controller through its latent space.

Capability-parity with reference ``ase/learning/hrl_agent.py``: HL actions are
``latent_dim`` vectors; each HL step runs ``llc_steps`` (5) inner env steps
querying the frozen LLC actor mean with the normalized latent
(hrl_agent.py:45-82, 231-245); task and LLC-discriminator rewards are averaged
over the window and combined 0.9/0.1 (251-256); dones/terminations OR over the
window. The LLC (params + obs/amp normalizer stats) is restored from an
ASEAgent checkpoint (202-214).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import yaml

from ase_tpu.learning import checkpoint as ckpt
from ase_tpu.learning.common_agent import CommonAgent, TrainState
from ase_tpu.learning.running_mean_std import RunningMeanStd
from ase_tpu.models import networks


class HRLAgent(CommonAgent):
    def __init__(self, env, cfg_train, output_dir="output"):
        config = cfg_train["params"]["config"]
        with open(config["llc_config"], "r") as f:
            llc_cfg = yaml.safe_load(f)
        self._llc_params_cfg = llc_cfg["params"]
        self._latent_dim = int(self._llc_params_cfg["config"]["latent_dim"])
        self._llc_steps = int(config["llc_steps"])
        self._task_reward_w = float(config["task_reward_w"])
        self._disc_reward_w = float(config["disc_reward_w"])
        self._disc_reward_scale = float(
            self._llc_params_cfg["config"].get("disc_reward_scale", 2.0)
        )

        self._task_size = env.get_task_obs_size()

        super().__init__(env, cfg_train, output_dir)

        self._llc_obs_dim = self.obs_dim - self._task_size
        self._amp_obs_dim = env.amp_obs_size()
        self._llc_network = networks.build_network(
            "ase", self._llc_params_cfg, self._llc_obs_dim,
            env.get_action_size(), amp_obs_dim=self._amp_obs_dim,
            latent_dim=self._latent_dim,
        )
        llc_checkpoint = config.get("llc_checkpoint", "")
        assert llc_checkpoint, "HRL training requires --llc_checkpoint"
        self._load_llc(llc_checkpoint)

    # -- LLC restore (reference _build_llc) ------------------------------------

    def _load_llc(self, path: str):
        rng = jax.random.PRNGKey(0)
        params_tpl = self._llc_network.init(
            rng,
            jnp.zeros((1, self._llc_obs_dim)),
            jnp.zeros((1, self._latent_dim)),
            jnp.zeros((1, self._amp_obs_dim)),
        )
        self._llc_params = ckpt.restore(path, params_tpl, prefix=".params")
        self._llc_obs_rms = ckpt.restore(
            path, RunningMeanStd.create((self._llc_obs_dim,)), prefix=".obs_rms"
        )
        self._llc_amp_rms = ckpt.restore(
            path, RunningMeanStd.create((self._amp_obs_dim,)), prefix=".extra['amp_rms']"
        )
        print(f"Loaded LLC checkpoint from {path}")

    # -- network ----------------------------------------------------------------

    def _actions_num(self) -> int:
        return self._latent_dim

    def _build_network(self):
        return networks.build_network(
            "hrl", self.cfg_train["params"], self.obs_dim, self._latent_dim
        )

    def _net_init_args(self, rng):
        return (jnp.zeros((1, self.obs_dim)),)

    def _actor_sigma(self, params, obs_n, extra):
        return self.network.apply(params, obs_n, method=self.network.eval_actor)

    def _critic(self, params, obs_n, extra):
        return self.network.apply(params, obs_n, method=self.network.eval_critic)

    # -- LLC helpers -------------------------------------------------------------

    def _compute_llc_action(self, obs, hl_actions):
        llc_obs = obs[..., : self._llc_obs_dim]
        llc_obs_n = self._llc_obs_rms.normalize(llc_obs)
        z = hl_actions / jnp.maximum(
            jnp.linalg.norm(hl_actions, axis=-1, keepdims=True), 1e-8
        )
        mu, _ = self._llc_network.apply(
            self._llc_params, llc_obs_n, z, method=self._llc_network.eval_actor
        )
        return jnp.clip(mu, -1.0, 1.0)

    def _calc_disc_reward(self, amp_obs):
        amp_n = self._llc_amp_rms.normalize(amp_obs)
        logits = self._llc_network.apply(
            self._llc_params, amp_n, method=self._llc_network.eval_disc
        )
        prob = jax.nn.sigmoid(logits)
        return -jnp.log(jnp.maximum(1.0 - prob, 0.0001)) * self._disc_reward_scale

    # -- temporal abstraction (reference env_step) -------------------------------

    def _env_step(self, ts: TrainState, env_state, actions, roll):
        actions = jnp.clip(actions, -1.0, 1.0)
        B = self.num_actors
        rewards = jnp.zeros(B)
        disc_rewards = jnp.zeros((B, 1))
        done_count = jnp.zeros(B, jnp.int32)
        term_count = jnp.zeros(B, jnp.int32)

        for _ in range(self._llc_steps):
            llc_actions = self._compute_llc_action(env_state.obs, actions)
            env_state = self.env.step(env_state, llc_actions)
            rewards = rewards + env_state.rew
            done_count = done_count + env_state.reset_buf
            term_count = term_count + env_state.terminate_buf
            amp_obs = self.env.amp_obs_flat(env_state)
            disc_rewards = disc_rewards + self._calc_disc_reward(amp_obs)

        rewards = rewards / self._llc_steps
        disc_rewards = disc_rewards / self._llc_steps

        env_state = env_state.replace(
            reset_buf=(done_count > 0).astype(jnp.int32),
            terminate_buf=(term_count > 0).astype(jnp.int32),
        )
        infos = {"disc_rewards": disc_rewards}
        return ts, env_state, rewards, infos, roll

    def _record_step(self, ts, env_state, roll, rec, infos):
        # per-window LLC disc rewards flow through the _env_step infos
        # contract (no attribute swapping; safe under pjit/sharded wrappers)
        rec["disc_rewards"] = infos["disc_rewards"]
        return rec

    def _process_rewards(self, ts, batch):
        batch["rewards"] = (
            self._task_reward_w * batch["rewards"]
            + self._disc_reward_w * batch["disc_rewards"]
        )
        return ts, batch
