"""Flagship learning validation (SURVEY §6 north star, VERDICT round-1 #4).

Two modes:

- ``ase``: ASE low-level-controller pretrain on the full 87-clip
  reallusion_sword_shield dataset (reference cfg
  ase/data/cfg/train/rlg/ase_humanoid.yaml:69, behavior spec
  ase/learning/ase_agent.py:404-490).  The paper's qualitative curves:
  discriminator (style) reward and encoder (skill) reward rise as the policy
  covers the motion manifold, episode length grows as it stops falling.
  Saves the resulting LLC checkpoint for the HRL stage.

- ``hrl``: high-level-controller training on one of the four downstream tasks
  (Heading/Location/Reach/Strike) from a frozen LLC (reference
  ase/learning/hrl_agent.py:45-82, 202-214; task rewards
  humanoid_heading.py:250-285, humanoid_location.py:184-227,
  humanoid_reach.py:184-195, humanoid_strike.py:218-251): task reward must
  trend up as the HLC learns to steer latents.

Appends a section to docs/VALIDATION.md and dumps the full metric history to
docs/validation_{mode}[_{task}]_history.json.

Usage:
  python scripts/validate_ase.py --mode ase --epochs 600
  python scripts/validate_ase.py --mode hrl --task HumanoidStrike --epochs 400 \
      --llc data/models/ase_llc_reallusion_sword_shield.ckpt.npz
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

DATASET = os.path.join(
    _ROOT, "data/motions/reallusion_sword_shield/"
    "dataset_reallusion_sword_shield.yaml"
)

# HRL downstream tasks -> env cfg (reference ase/data/cfg/*.yaml)
HRL_TASK_CFG = {
    "HumanoidHeading": "humanoid_sword_shield_heading.yaml",
    "HumanoidLocation": "humanoid_sword_shield_location.yaml",
    "HumanoidReach": "humanoid_sword_shield_reach.yaml",
    "HumanoidStrike": "humanoid_sword_shield_strike.yaml",
}


def run(args):
    import jax
    import numpy as np
    import yaml

    from ase_tpu.envs import parse_task
    from ase_tpu.learning import checkpoint as ckpt

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    if args.mode == "ase":
        from ase_tpu.learning.ase_agent import ASEAgent

        cfg = yaml.safe_load(
            open(os.path.join(root, "data/cfg/humanoid_ase_sword_shield_getup.yaml")))
        cfg_train = yaml.safe_load(
            open(os.path.join(root, "data/cfg/train/rlg/ase_humanoid.yaml")))
        task, agent_cls = "HumanoidAMPGetup", ASEAgent
        curve_keys = ["disc_reward_mean", "enc_reward_mean",
                      "game_length_mean", "reward_mean"]
    else:
        from ase_tpu.learning.hrl_agent import HRLAgent

        cfg = yaml.safe_load(
            open(os.path.join(root, "data/cfg", HRL_TASK_CFG[args.task])))
        cfg_train = yaml.safe_load(
            open(os.path.join(root, "data/cfg/train/rlg/hrl_humanoid.yaml")))
        cfg_train["params"]["config"]["llc_checkpoint"] = args.llc
        task, agent_cls = args.task, HRLAgent
        curve_keys = ["reward_mean", "game_reward_mean", "game_length_mean"]
        if args.task == "HumanoidStrike":
            # strike publishes aux['successes'] (reference capability surface,
            # ase/run.py:66-97); chart the windowed consecutive-success meter
            curve_keys.append("consecutive_successes_mean")

    cfg["env"]["numEnvs"] = args.num_envs
    cfg["env"]["motion_file"] = args.motion
    cfg["env"]["resetChunk"] = 512
    cfg["name"] = task
    c = cfg_train["params"]["config"]
    c["num_actors"] = args.num_envs
    c["horizon_length"] = args.horizon
    c["minibatch_size"] = min(16384, args.num_envs * args.horizon)
    c["mixed_precision"] = True
    c["save_frequency"] = 0

    tag = args.mode if args.mode == "ase" else (
        "hrl_" + args.task.replace("Humanoid", "").lower())
    if args.tag_suffix:
        tag = f"{tag}_{args.tag_suffix}"

    env = parse_task(task, cfg)
    agent = agent_cls(env, cfg_train)

    ts = agent.init_train_state(jax.random.PRNGKey(args.seed))
    env_state = env.initial_state(jax.random.PRNGKey(args.seed + 1))

    history = []
    t_start = time.time()
    for epoch in range(args.epochs):
        t0 = time.time()
        ts, env_state, metrics = agent.train_epoch(ts, env_state)
        m = {k: float(np.asarray(v)) for k, v in jax.device_get(metrics).items()
             if np.ndim(v) == 0}
        m["epoch"] = epoch
        m["fps"] = agent.batch_size / (time.time() - t0)
        history.append(m)
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            msg = " ".join(f"{k} {m.get(k, float('nan')):.3f}" for k in curve_keys)
            print(f"epoch {epoch} fps {m['fps']:.0f} {msg}", flush=True)
        if args.ckpt_out and (epoch + 1) % max(args.epochs // 3, 1) == 0:
            os.makedirs(os.path.dirname(args.ckpt_out), exist_ok=True)
            ckpt.save(args.ckpt_out, ts, exclude=agent._ckpt_exclude())
        if epoch % 50 == 49:  # crash-safe incremental curve dump
            with open(os.path.join(
                    root, f"docs/validation_{tag}_history.json"), "w") as f:
                json.dump(history, f)

    wall = time.time() - t_start
    if args.ckpt_out:
        os.makedirs(os.path.dirname(args.ckpt_out), exist_ok=True)
        ckpt.save(args.ckpt_out, ts, exclude=agent._ckpt_exclude())

    hist_path = os.path.join(root, f"docs/validation_{tag}_history.json")
    with open(hist_path, "w") as f:
        json.dump(history, f)

    if args.no_doc:
        print(f"validation ({args.mode}) done in {wall:.0f}s (doc append skipped)")
        return

    # table: ~8 evenly spaced checkpoints
    picks = sorted({0, *range(0, args.epochs, max(args.epochs // 7, 1)),
                    args.epochs - 1})
    title = ("ASE LLC pretrain — 87-clip sword&shield dataset"
             if args.mode == "ase" else
             f"HRL {args.task} — frozen LLC")
    with open(os.path.join(root, "docs/VALIDATION.md"), "a") as f:
        f.write(f"\n## {title}\n\n")
        f.write(f"Task {task}, {args.num_envs} envs, horizon {args.horizon}, "
                f"{args.epochs} epochs ({args.epochs * agent.batch_size:,} "
                f"env-steps) in {wall:.0f}s on "
                f"{jax.devices()[0].device_kind}, seed {args.seed}.\n\n")
        f.write("| epoch | " + " | ".join(curve_keys) + " |\n")
        f.write("|" + "---|" * (len(curve_keys) + 1) + "\n")
        for e in picks:
            h = history[e]
            f.write(f"| {e} | " + " | ".join(
                f"{h.get(k, float('nan')):.3f}" for k in curve_keys) + " |\n")
        f.write(f"\nFull history: `{os.path.basename(hist_path)}`\n")
    print(f"validation ({args.mode}) done in {wall:.0f}s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["ase", "hrl"], default="ase")
    p.add_argument("--task", choices=sorted(HRL_TASK_CFG), default="HumanoidHeading",
                   help="HRL downstream task (hrl mode only)")
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--motion", default=DATASET)
    p.add_argument("--llc", default="data/models/ase_llc_reallusion_sword_shield.ckpt.npz")
    p.add_argument("--ckpt-out", default="")
    p.add_argument("--tag-suffix", default="",
                   help="suffix for the history json tag (write a fresh curve "
                        "next to an existing one for overlay comparisons)")
    p.add_argument("--no-doc", action="store_true",
                   help="skip the VALIDATION.md append (checkpoint-production "
                        "reruns of already-documented configs)")
    args = p.parse_args()
    if args.mode == "ase" and not args.ckpt_out:
        args.ckpt_out = "output/validate_ase/llc.ckpt.npz"
    run(args)


if __name__ == "__main__":
    main()
