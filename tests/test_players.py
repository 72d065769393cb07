"""Player (eval) path: checkpoint restore + deterministic rollout."""

import copy

import jax
import numpy as np
import pytest

from ase_tpu.envs import parse_task
from ase_tpu.learning import checkpoint as ckpt
from ase_tpu.learning.amp_agent import AMPAgent
from ase_tpu.learning.players import AMPPlayer
from tests.test_env import make_cfg
from tests.test_learning import TRAIN_CFG


def test_amp_player_runs(tmp_path):
    env = parse_task("HumanoidAMP", make_cfg())
    agent = AMPAgent(env, copy.deepcopy(TRAIN_CFG))
    ts = agent.init_train_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    ckpt.save(path, ts)

    player = AMPPlayer(agent, deterministic=True)
    restored = player.restore(path)
    a = jax.tree_util.tree_leaves(jax.device_get(ts.params))
    b = jax.tree_util.tree_leaves(jax.device_get(restored.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    stats = player.run(num_steps=8)
    assert np.isfinite(stats["running_return_mean"])

    # disc-reward probe (the reference _amp_debug path)
    env_state = env.initial_state(jax.random.PRNGKey(2))
    r = player.disc_reward(restored, env_state)
    assert r.shape == (4, 1) and bool(np.all(np.isfinite(np.asarray(r))))


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
