"""Single data-root resolution point (standalone operation).

The framework vendors all the data it needs under ``<repo>/data`` (MJCF/URDF
assets, the 87-clip reallusion_sword_shield motion dataset, configs, shipped
checkpoints — see ``data/assets/PROVENANCE.md``).  Every consumer of data
paths (bench, tests, scripts, driver entry, asset loader) resolves through
here so the repo runs with no external mounts.

Resolution order:
  1. ``ASE_TPU_DATA_ROOT`` environment variable, if set;
  2. the vendored ``<repo>/data`` directory.

Reference parity note: the reference ships its data the same way
(``ase/data/...``) and resolves it relative to the repo checkout
(reference ``ase/utils/config.py:52-67`` builds paths from the working dir).
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def repo_root() -> str:
    return _REPO_ROOT


def data_root() -> str:
    """The data directory: $ASE_TPU_DATA_ROOT or the vendored <repo>/data."""
    env = os.environ.get("ASE_TPU_DATA_ROOT")
    if env:
        return env
    return os.path.join(_REPO_ROOT, "data")


def data_path(*rel: str) -> str:
    """Join a relative path onto the data root (no existence check)."""
    return os.path.join(data_root(), *rel)


def asset_root() -> str:
    return data_path("assets")


def motion_file(rel: str) -> str:
    """Resolve a motion file: absolute paths pass through; otherwise look
    under <data>/motions, then <data> itself."""
    if os.path.isabs(rel) and os.path.exists(rel):
        return rel
    for cand in (rel, data_path("motions", rel), data_path(rel)):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"motion file {rel!r} not found (data root: {data_root()}; "
        "set ASE_TPU_DATA_ROOT to point at a data directory)")


# The flagship dataset / single-clip defaults (vendored).
DATASET_YAML = "reallusion_sword_shield/dataset_reallusion_sword_shield.yaml"
IDLE_CLIP = "reallusion_sword_shield/RL_Avatar_Idle_Ready_Motion.npy"


def default_dataset() -> str:
    return motion_file(DATASET_YAML)


def default_clip() -> str:
    return motion_file(IDLE_CLIP)
