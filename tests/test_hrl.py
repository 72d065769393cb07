"""HRL pipeline test: pretrain a tiny ASE LLC, checkpoint it, then drive a
task env through the frozen LLC with the high-level agent (reference
hrl_agent.py flow)."""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from ase_tpu.envs import parse_task
from ase_tpu.learning import checkpoint as ckpt
from ase_tpu.learning.ase_agent import ASEAgent
from ase_tpu.learning.hrl_agent import HRLAgent
from tests.test_env import make_cfg
from tests.test_learning import TRAIN_CFG


def test_hrl_end_to_end(tmp_path):
    # 1. tiny ASE LLC on the plain AMP env
    env = parse_task("HumanoidAMP", make_cfg())
    ase_cfg = copy.deepcopy(TRAIN_CFG)
    ase_cfg["params"]["algo"]["name"] = "ase"
    ase_cfg["params"]["network"]["name"] = "ase"
    llc_agent = ASEAgent(env, ase_cfg)
    ts = llc_agent.init_train_state(jax.random.PRNGKey(0))
    llc_path = str(tmp_path / "llc.ckpt")
    ckpt.save(llc_path, ts)

    # 2. llc config file for the HRL agent to read
    llc_cfg_path = str(tmp_path / "llc_cfg.yaml")
    with open(llc_cfg_path, "w") as f:
        yaml.safe_dump(ase_cfg, f)

    # 3. heading task env + HRL agent
    cfg = make_cfg(
        tarSpeedMin=1.0, tarSpeedMax=1.5, headingChangeStepsMin=10,
        headingChangeStepsMax=20, enableRandHeading=True,
        enableTaskObs=True, stateInit="Default",
    )
    task_env = parse_task("HumanoidHeading", cfg)

    hrl_cfg = copy.deepcopy(TRAIN_CFG)
    hrl_cfg["params"]["algo"]["name"] = "hrl"
    hrl_cfg["params"]["network"]["name"] = "hrl"
    c = hrl_cfg["params"]["config"]
    c["llc_config"] = llc_cfg_path
    c["llc_checkpoint"] = llc_path
    c["llc_steps"] = 2
    c["task_reward_w"] = 0.9
    c["disc_reward_w"] = 0.1
    c["horizon_length"] = 2
    c["minibatch_size"] = 4

    agent = HRLAgent(task_env, hrl_cfg)
    assert agent.action_dim == 8  # latent_dim from the LLC config

    hts = agent.init_train_state(jax.random.PRNGKey(1))
    env_state = task_env.initial_state(jax.random.PRNGKey(2))
    hts, env_state, metrics = agent.train_epoch(hts, env_state)
    m = jax.device_get(metrics)
    assert np.isfinite(m["a_loss"]) and np.isfinite(m["kl"])
    # HL progress advances llc_steps per HL action
    assert int(env_state.progress.max()) >= 2


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
