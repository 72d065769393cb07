"""Player (eval) path: checkpoint restore, deterministic rollout, the
games_num episode loop, and the _amp_debug-style disc/enc probes for the
AMP/ASE/HRL players (reference common_player.py:25-127, amp_players.py:33-56,
ase_players.py:82-98, hrl_players.py:169-208)."""

import copy

import jax
import numpy as np
import pytest
import yaml

from ase_tpu.envs import parse_task
from ase_tpu.learning import checkpoint as ckpt
from ase_tpu.learning.amp_agent import AMPAgent
from ase_tpu.learning.ase_agent import ASEAgent
from ase_tpu.learning.hrl_agent import HRLAgent
from ase_tpu.learning.players import AMPPlayer, ASEPlayer, HRLPlayer
from tests.test_env import make_cfg
from tests.test_learning import TRAIN_CFG


def test_amp_player_runs(tmp_path, capsys):
    env = parse_task("HumanoidAMP", make_cfg())
    agent = AMPAgent(env, copy.deepcopy(TRAIN_CFG))
    ts = agent.init_train_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    ckpt.save(path, ts)

    player = AMPPlayer(agent, deterministic=True, debug_probes=True)
    restored = player.restore(path)
    a = jax.tree_util.tree_leaves(jax.device_get(ts.params))
    b = jax.tree_util.tree_leaves(jax.device_get(restored.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    stats = player.run(num_steps=8, games_num=2, max_chunks=4)
    assert np.isfinite(stats["running_return_mean"])
    # probe keys from _amp_debug are in the returned stats and finite
    assert np.isfinite(stats["disc_pred"])
    assert np.isfinite(stats["disc_reward"])
    out = capsys.readouterr().out
    assert "av reward:" in out and "probe:" in out and "disc_pred" in out

    # disc-reward probe (the reference _amp_debug path)
    env_state = env.initial_state(jax.random.PRNGKey(2))
    r = player.disc_reward(restored, env_state)
    assert r.shape == (4, 1) and bool(np.all(np.isfinite(np.asarray(r))))


def test_games_num_episode_loop(capsys):
    """The player keeps rolling chunks until games_num episodes finish and
    prints per-game-batch stats (reference per-step 'reward: .. steps: ..')."""
    cfg = make_cfg(episodeLength=5, stateInit="Default")
    env = parse_task("HumanoidAMP", cfg)
    agent = AMPAgent(env, copy.deepcopy(TRAIN_CFG))
    player = AMPPlayer(agent, deterministic=True)
    player.restore_ts = None
    ts = agent.init_train_state(jax.random.PRNGKey(0))
    player.ts = ts

    # 4 envs x episodeLength 5: one 6-step chunk finishes >= 4 games
    stats = player.run(num_steps=6, games_num=4, max_chunks=10)
    assert stats["episodes"] >= 4
    assert stats["mean_length"] <= 5.01
    out = capsys.readouterr().out
    assert "reward:" in out and "steps:" in out


def test_ase_player_probe():
    env = parse_task("HumanoidAMP", make_cfg())
    ase_cfg = copy.deepcopy(TRAIN_CFG)
    ase_cfg["params"]["algo"]["name"] = "ase"
    ase_cfg["params"]["network"]["name"] = "ase"
    agent = ASEAgent(env, ase_cfg)
    player = ASEPlayer(agent, deterministic=True, debug_probes=True)
    player.ts = agent.init_train_state(jax.random.PRNGKey(0))

    stats = player.run(num_steps=4, games_num=1, max_chunks=2)
    # disc + enc probes both present (reference ase_players._amp_debug)
    assert np.isfinite(stats["disc_pred"])
    assert np.isfinite(stats["enc_reward"])

    # direct enc-reward probe path
    env_state = env.initial_state(jax.random.PRNGKey(2))
    roll = agent._init_rollout_carry(player.ts, env_state)
    r = player.enc_reward(player.ts, env_state, roll["ase_latents"])
    assert r.shape == (4, 1) and bool(np.all(np.isfinite(np.asarray(r))))


def test_hrl_player_runs(tmp_path):
    """Real HRL eval: HL latent actions drive the frozen LLC through the
    agent's llc_steps window; the probe reports the LLC disc reward."""
    env = parse_task("HumanoidAMP", make_cfg())
    ase_cfg = copy.deepcopy(TRAIN_CFG)
    ase_cfg["params"]["algo"]["name"] = "ase"
    ase_cfg["params"]["network"]["name"] = "ase"
    llc_agent = ASEAgent(env, ase_cfg)
    llc_ts = llc_agent.init_train_state(jax.random.PRNGKey(0))
    llc_path = str(tmp_path / "llc.ckpt")
    ckpt.save(llc_path, llc_ts)
    llc_cfg_path = str(tmp_path / "llc_cfg.yaml")
    with open(llc_cfg_path, "w") as f:
        yaml.safe_dump(ase_cfg, f)

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

    agent = HRLAgent(task_env, hrl_cfg)
    hts = agent.init_train_state(jax.random.PRNGKey(1))
    path = str(tmp_path / "hrl.ckpt")
    ckpt.save(path, hts)

    player = HRLPlayer(agent, deterministic=True, debug_probes=True)
    player.restore(path)
    stats = player.run(num_steps=3, games_num=1, max_chunks=2)
    assert np.isfinite(stats["running_return_mean"])
    assert np.isfinite(stats["llc_disc_reward"])
    # each HL step advanced the env llc_steps times: probes saw live state
    assert stats["mean_length"] >= 0


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
