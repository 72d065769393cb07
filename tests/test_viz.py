"""Visualization smoke tests (headless Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_env import MOTION, make_cfg


def test_plot_skeleton_state_and_motion(tmp_path):
    from ase_tpu.motion import motion_lib as ml
    from ase_tpu.viz.plotter import plot_skeleton_motion, plot_skeleton_state

    tree, lr, rt, fps, _, _ = ml.load_motion_npy(MOTION)
    plot_skeleton_state(tree, lr[0], rt[0], show=False)
    out = tmp_path / "clip.gif"
    plot_skeleton_motion(tree, lr[:5], rt[:5], fps=fps, save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_plot_env_state_with_task_markers():
    from ase_tpu.envs import parse_task
    from ase_tpu.viz.plotter import plot_env_state

    cfg = make_cfg(tarSpeedMin=1.5, tarSpeedMax=1.6, headingChangeStepsMin=10,
                   headingChangeStepsMax=20, enableRandHeading=True,
                   enableTaskObs=True, stateInit="Default")
    env = parse_task("HumanoidHeading", cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    assert "tar_dir" in state.aux
    ax = plot_env_state(env, state, env_id=0, show=False)
    # the marker layers were drawn: legend exists and quiver collections added
    assert ax.get_legend() is not None


def test_render_rollout_writes_video(tmp_path):
    """Synthetic 4-frame rollout → mp4 (cv2) with marker overlays."""
    from ase_tpu.viz.plotter import render_rollout

    parents = [-1, 0, 1, 0]
    rng = np.random.default_rng(0)
    body_pos = rng.normal(size=(4, 4, 3)).astype(np.float32)
    body_pos[..., 2] += 1.0
    markers = {
        "tar_dir": np.tile(np.array([1.0, 0.0]), (4, 1)),
        "tar_pos": np.tile(np.array([0.5, 0.5, 0.9]), (4, 1)),
    }
    out = str(tmp_path / "roll.mp4")
    written = render_rollout(parents, body_pos, markers=markers, fps=10,
                             save_path=out, title="test")
    import os
    assert os.path.exists(written) and os.path.getsize(written) > 0


def test_player_save_video_end_to_end(tmp_path):
    """--test --save_video path: a fresh AMP policy rolls out and the player
    writes a playable video of env 0 (the reference's viewer eval, headless —
    reference base_task.py:142-164)."""
    import copy

    from ase_tpu.envs import parse_task
    from ase_tpu.learning.amp_agent import AMPAgent
    from ase_tpu.learning.players import AMPPlayer
    from tests.test_learning import TRAIN_CFG

    env = parse_task("HumanoidAMP", make_cfg())
    agent = AMPAgent(env, copy.deepcopy(TRAIN_CFG))
    player = AMPPlayer(agent, deterministic=True, print_stats=False)
    player.ts = agent.init_train_state(jax.random.PRNGKey(0))

    out = str(tmp_path / "rollout.mp4")
    player.run(num_steps=3, games_num=1, max_chunks=2,
               video_path=out, video_max_frames=6)
    import glob
    import os
    produced = glob.glob(str(tmp_path / "rollout.*"))
    assert produced and os.path.getsize(produced[0]) > 0


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
