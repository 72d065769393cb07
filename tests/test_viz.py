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


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
