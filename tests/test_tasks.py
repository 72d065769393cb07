"""Task env smoke tests: Strike (prop contacts), Perturb (projectiles),
Location/Reach rewards, VecEnv adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ase_tpu.envs import parse_task
from ase_tpu.envs.vec_env import VecEnv
from tests.test_env import make_cfg


def test_strike_env():
    cfg = make_cfg(
        strikeBodyNames=["sword", "right_hand", "right_lower_arm"],
        enableTaskObs=True, stateInit="Default", numEnvs=2,
    )
    env = parse_task("HumanoidStrike", cfg)
    assert env.model.num_props == 1
    assert env.get_obs_size() == 253 + 15
    state = env.initial_state(jax.random.PRNGKey(0))
    # target placed at sampled distance, upright at z=0.9
    tar = np.asarray(state.phys.prop_pos[:, 0])
    assert np.all(np.abs(tar[:, 2] - 0.9) < 1e-5)
    dist = np.linalg.norm(tar[:, :2] - np.asarray(state.phys.root_pos[:, :2]), axis=-1)
    assert np.all(dist >= 0.4)
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros((2, 31)))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    assert bool(jnp.all(jnp.isfinite(state.rew)))
    # target stays near the ground under gravity + contacts
    assert float(state.phys.prop_pos[:, 0, 2].min()) > 0.0
    # success signal published for the observer-style meters: upright target
    # -> 0; a hand-tipped target -> 1 (reference RLGPUAlgoObserver surface)
    assert "successes" in state.aux
    np.testing.assert_array_equal(np.asarray(state.aux["successes"]), 0.0)
    from ase_tpu.ops import quat as rot
    tipped = rot.quat_from_angle_axis(
        jnp.full((2,), np.pi / 2), jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (2, 1)))
    state_tipped = state.replace(
        phys=state.phys._replace(prop_quat=state.phys.prop_quat.at[:, 0].set(tipped)))
    state_tipped = env.post_physics_step(state_tipped)
    np.testing.assert_array_equal(np.asarray(state_tipped.aux["successes"]), 1.0)


def test_success_meter_plumbing():
    """aux['successes'] flows into the agent's windowed success meter
    (reference run.py:66-97 consecutive_successes observer)."""
    import copy

    from ase_tpu.learning.amp_agent import AMPAgent
    from tests.test_learning import TRAIN_CFG

    cfg = make_cfg(
        strikeBodyNames=["sword", "right_hand", "right_lower_arm"],
        enableTaskObs=True, stateInit="Default", numEnvs=2, episodeLength=3,
    )
    env = parse_task("HumanoidStrike", cfg)
    agent = AMPAgent(env, copy.deepcopy(TRAIN_CFG))
    ts = agent.init_train_state(jax.random.PRNGKey(0))
    env_state = env.initial_state(jax.random.PRNGKey(1))
    ts, env_state, metrics = agent.train_epoch(ts, env_state)
    m = jax.device_get(metrics)
    # metric exists and is a valid rate (upright targets -> 0.0 here)
    assert "consecutive_successes_mean" in m
    assert 0.0 <= float(m["consecutive_successes_mean"]) <= 1.0
    # direct meter check: a successful finished game lands in the window
    extra = agent._update_game_meters(
        ts.extra, jnp.zeros(2), jnp.array([1.0, 0.0]),
        successes=jnp.array([1.0, 0.0]))
    assert float(jnp.sum(extra["game_success_buf"])) >= 1.0


def test_location_reach_rewards():
    for task, extra in [
        ("HumanoidLocation", dict(tarSpeed=1.0, tarChangeStepsMin=10,
                                  tarChangeStepsMax=20, tarDistMax=5.0)),
        ("HumanoidReach", dict(tarSpeed=1.0, tarChangeStepsMin=10,
                               tarChangeStepsMax=20, tarDistMax=1.0,
                               tarHeightMin=0.2, tarHeightMax=2.0,
                               reachBodyName="sword")),
    ]:
        cfg = make_cfg(enableTaskObs=True, stateInit="Default", numEnvs=2, **extra)
        env = parse_task(task, cfg)
        state = env.initial_state(jax.random.PRNGKey(0))
        state = jax.jit(env.step)(state, jnp.zeros((2, 31)))
        r = np.asarray(state.rew)
        assert np.all(np.isfinite(r)) and np.all(r >= 0.0) and np.all(r <= 1.0 + 1e-5)


def test_perturb_env():
    cfg = make_cfg(numEnvs=2, stateInit="Default", maxContacts=32)
    env = parse_task("HumanoidPerturb", cfg)
    assert env.model.num_props == 13
    state = env.initial_state(jax.random.PRNGKey(0))
    # projectiles parked far away initially
    assert float(state.phys.prop_pos[:, :, 0].min()) > 100.0
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros((2, 31)))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    # termination disabled
    assert int(state.terminate_buf.sum()) == 0


def test_vec_env_adapter():
    env = parse_task("HumanoidAMP", make_cfg())
    vec = VecEnv(env)
    info = vec.get_env_info()
    assert info["action_space"].shape == (31,)
    assert info["observation_space"].shape == (253,)
    assert info["amp_observation_space"].shape == (1400,)
    obs, rew, done, infos = vec.step(np.zeros((4, 31)))
    assert obs.shape == (4, 253)
    assert infos["amp_obs"].shape == (4, 1400)
    obs = vec.reset([0, 1])
    assert obs.shape == (4, 253)
    demo = vec.fetch_amp_obs_demo(8)
    assert demo.shape == (8, 1400)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
