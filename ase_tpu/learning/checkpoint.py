"""Checkpoint save/restore of train-state pytrees (path-keyed npz).

Parity with the reference's rl_games ``save``/``restore`` of .pth dicts
(reference common_agent.py:141-170): weights, optimizer state, normalizer
statistics, epoch/frame counters and RNG are all captured because they are
all fields of the TrainState pytree. Leaves are keyed by their tree path, so
sub-trees (e.g. just the policy params + obs normalizer of a pretrained LLC,
reference hrl_agent.py:202-214) can be loaded independently.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np


def _leaf_key(path) -> str:
    return jax.tree_util.keystr(path)


def _fetchable(v: Any) -> Any:
    """Make a leaf device_get-able under multi-controller JAX.

    A global jax.Array spanning other processes' devices cannot be fetched
    directly. TrainState leaves are replicated across the mesh (every device
    holds the full value), so the local shard IS the value — read it instead.
    """
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        if not getattr(v, "is_fully_replicated", False):
            from jax.experimental import multihost_utils
            return multihost_utils.process_allgather(v, tiled=True)
        return v.addressable_shards[0].data
    return v


def save(path: str, state: Any, exclude: tuple = ()) -> None:
    """Write a path-keyed npz of the pytree. `exclude` is a tuple of key
    substrings to skip (e.g. reconstructible device buffers — the reference
    .pth checkpoints don't persist the AMP demo/replay buffers either, and
    they dominate size: ~2.2 GB at the production buffer sizes).

    Multi-controller: call from EVERY process (fetching non-addressable
    leaves is a collective); only process 0 touches the filesystem —
    the reference's rank-0 saving (reference common_agent.py:141).
    """
    # filter BEFORE device_get: excluded leaves (the ~2.2 GB demo/replay
    # buffers) must never cross the host↔device link — fetching them over
    # the TPU tunnel costs minutes per save
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    kept = [(p, v) for p, v in leaves
            if not any(x in _leaf_key(p) for x in exclude)]
    fetched = jax.device_get([_fetchable(v) for _, v in kept])
    if jax.process_index() != 0:
        return
    arrays = {_leaf_key(p): np.asarray(v)
              for (p, _), v in zip(kept, fetched)}
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_dict(path: str) -> dict:
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    return dict(np.load(path))


def restore(path: str, template: Any, prefix: str = "", strict: bool = True,
            allow_missing: tuple = ()) -> Any:
    """Load leaves matching `prefix` into the structure of `template`.

    Template leaf paths are matched against checkpoint keys after stripping
    `prefix` from the checkpoint side. With ``strict`` (training resume),
    missing keys and shape mismatches raise — EXCEPT for leaves whose key
    contains a substring in ``allow_missing`` (the known-transient subtrees a
    buffer-excluding `save` legitimately drops, e.g. the reconstructible AMP
    demo/replay buffers): those keep the template value. Anything else
    missing means a wrong/renamed checkpoint and must fail loudly rather
    than silently resuming from partially fresh weights.

    Non-strict (player/eval restore, reference rl_games set_weights
    semantics: weights + normalizers only) keeps the template value for
    missing keys AND for leaves whose shape depends on the env batch (e.g.
    per-env `ase_latents`, `cur_rewards`) — a checkpoint trained at 4096
    envs must evaluate at any env count.
    """
    data = load_dict(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for p, v in leaves:
        key = prefix + _leaf_key(p)
        skippable = (not strict) or any(x in key for x in allow_missing)
        if key not in data:
            if not skippable:
                raise KeyError(f"checkpoint missing {key}")
            out.append(v)
            continue
        arr = data[key]
        if hasattr(v, "shape") and tuple(np.shape(v)) != tuple(arr.shape):
            if not skippable:
                raise ValueError(
                    f"{key}: shape {arr.shape} != template {np.shape(v)}"
                )
            out.append(v)
            continue
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, [x for x in out])


def restore_subtree(path: str, template: Any, key_prefix: str) -> Any:
    """Restore a template whose leaves correspond to checkpoint keys that
    start with `key_prefix` (e.g. ".params" or ".extra['amp_rms']")."""
    return restore(path, template, prefix=key_prefix)
