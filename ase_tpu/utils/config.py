"""CLI flags + YAML config loading/merging.

Keeps the reference's two-file config contract (``--cfg_env`` env+sim YAML,
``--cfg_train`` rl-params YAML) and CLI flag surface
(reference ``ase/utils/config.py:52-231``) so existing ASE workflows port
directly: same flag names, same override precedence, same registry names.
"""

from __future__ import annotations

import argparse
import os
import random
from typing import Any, Dict, Optional, Tuple

import numpy as np
import yaml

SIM_TIMESTEP = 1.0 / 60.0

_CFG_ROOTS = [
    "data/cfg",
    os.path.join(os.path.dirname(__file__), "../../data/cfg"),
]


def _resolve_cfg(path: str) -> str:
    if os.path.exists(path):
        return path
    for root in _CFG_ROOTS:
        cand = os.path.join(root, path)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"config {path} not found")


def get_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="ase_tpu runner")
    p.add_argument("--test", action="store_true", help="Run trained policy, no training")
    p.add_argument("--play", action="store_true", help="Alias for --test")
    p.add_argument("--resume", type=int, default=0, help="Resume training")
    p.add_argument("--checkpoint", type=str, default="Base", help="Checkpoint path")
    p.add_argument("--headless", action="store_true", default=True)
    p.add_argument("--horovod", action="store_true", help="(compat) multi-chip data parallel")
    p.add_argument("--multi_gpu", action="store_true", help="Shard envs over all local devices")
    p.add_argument("--multi_host", action="store_true",
                   help="Initialize jax.distributed and shard envs over every "
                        "device of every host (pod slices / multi-slice)")
    p.add_argument("--task", type=str, default="HumanoidAMP")
    p.add_argument("--cfg_env", type=str, default="humanoid_sword_shield.yaml")
    p.add_argument("--cfg_train", type=str, default="train/rlg/amp_humanoid.yaml")
    p.add_argument("--motion_file", type=str, default=None)
    p.add_argument("--num_envs", type=int, default=0)
    p.add_argument("--episode_length", type=int, default=0)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--max_iterations", type=int, default=0)
    p.add_argument("--horizon_length", type=int, default=-1)
    p.add_argument("--minibatch_size", type=int, default=-1)
    p.add_argument("--rl_device", type=str, default="tpu",
                   help="Compute platform: 'tpu' (default) or 'cpu' (forces "
                        "the JAX CPU backend, e.g. for debugging)")
    p.add_argument("--llc_checkpoint", type=str, default="")
    p.add_argument("--output_path", type=str, default="output")
    p.add_argument("--experiment", type=str, default="Base",
                   help="Experiment name: overrides the train-config run "
                        "name (checkpoint files, reference config.py:85-95)")
    p.add_argument("--logdir", type=str, default="",
                   help="TensorBoard dir (default <output_path>/summaries)")
    p.add_argument("--randomize", action="store_true", help="Domain randomization")
    p.add_argument("--bench", action="store_true",
                   help="Benchmark mode: no TensorBoard writer, no checkpoint saves")
    p.add_argument("--save_video", type=str, default="",
                   help="With --test: render env 0's rollout to this mp4/gif "
                        "(headless replacement for the reference viewer)")
    args = p.parse_args(argv)
    if args.play:
        args.test = True
    return args


def load_cfg(args) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    with open(_resolve_cfg(args.cfg_env), "r") as f:
        cfg = yaml.safe_load(f)
    with open(_resolve_cfg(args.cfg_train), "r") as f:
        cfg_train = yaml.safe_load(f)

    # CLI overrides (reference config.py:75-120)
    if args.num_envs > 0:
        cfg["env"]["numEnvs"] = args.num_envs
    if args.episode_length > 0:
        cfg["env"]["episodeLength"] = args.episode_length
    if args.motion_file:
        cfg["env"]["motion_file"] = args.motion_file
    cfg["name"] = args.task
    cfg["headless"] = args.headless

    # physics domain randomization (reference config.py:70-76): the CLI flag
    # ORs into the cfg's own task.randomize; the env reads cfg.task.*
    if "task" in cfg:
        cfg["task"]["randomize"] = bool(
            args.randomize or cfg["task"].get("randomize", False))
    else:
        cfg["task"] = {"randomize": bool(args.randomize)}

    train_cfg = cfg_train["params"]["config"]
    # --experiment overrides the run name that checkpoints/logs are keyed by
    # (reference config.py:85-95; the isaac-metadata variant is N/A here)
    if getattr(args, "experiment", "Base") != "Base":
        train_cfg["name"] = args.experiment
    train_cfg["num_actors"] = cfg["env"]["numEnvs"]
    if args.max_iterations > 0:
        train_cfg["max_epochs"] = args.max_iterations
    if args.horizon_length > -1:
        train_cfg["horizon_length"] = args.horizon_length
    if args.minibatch_size > -1:
        train_cfg["minibatch_size"] = args.minibatch_size
    if args.llc_checkpoint:
        train_cfg["llc_checkpoint"] = args.llc_checkpoint

    seed = cfg_train["params"].get("seed", -1)
    if args.seed != -1:
        seed = args.seed
    cfg_train["params"]["seed"] = set_seed(seed)
    cfg["seed"] = cfg_train["params"]["seed"]
    return cfg, cfg_train


def set_seed(seed: int) -> int:
    if seed == -1:
        seed = np.random.randint(0, 10000)
    random.seed(seed)
    np.random.seed(seed)
    return seed
