"""Learning validation: AMP single-clip imitation must show the reference's
qualitative curves — discriminator reward rising, episode length growing as
the policy learns to imitate without falling (SURVEY §6 north star).

Writes docs/VALIDATION.md with the metric trajectory.

Usage: python scripts/validate_learning.py [--epochs 300] [--num-envs 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--task", default="HumanoidAMP")
    p.add_argument("--motion", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data/motions/reallusion_sword_shield/RL_Avatar_Idle_Ready_Motion.npy"))
    p.add_argument("--out", default="docs/VALIDATION.md")
    args = p.parse_args()

    import jax
    import numpy as np
    import yaml

    from ase_tpu.envs import parse_task
    from ase_tpu.learning.amp_agent import AMPAgent

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = yaml.safe_load(open(os.path.join(root, "data/cfg/humanoid_sword_shield.yaml")))
    cfg["env"]["numEnvs"] = args.num_envs
    cfg["env"]["motion_file"] = args.motion
    cfg_train = yaml.safe_load(open(os.path.join(root, "data/cfg/train/rlg/amp_humanoid.yaml")))
    c = cfg_train["params"]["config"]
    c["minibatch_size"] = min(16384, args.num_envs * c["horizon_length"] // 2)
    c["save_frequency"] = 0

    env = parse_task(args.task, cfg)
    agent = AMPAgent(env, cfg_train)

    ts = agent.init_train_state(jax.random.PRNGKey(0))
    env_state = env.initial_state(jax.random.PRNGKey(1))

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
        if epoch % 10 == 0:
            print(
                f"epoch {epoch} fps {m['fps']:.0f} "
                f"disc_agent_acc {m['disc_agent_acc']:.3f} "
                f"reward_mean {m['reward_mean']:.3f} "
                f"game_len {m['game_length_mean']:.1f} kl {m['kl']:.4f}",
                flush=True,
            )

    wall = time.time() - t_start
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    def row(e):
        h = history[e]
        return (f"| {e} | {h['reward_mean']:.3f} | {h['disc_agent_acc']:.3f} | "
                f"{h['disc_demo_acc']:.3f} | {h['game_length_mean']:.1f} | "
                f"{h['kl']:.4f} |")

    picks = [e for e in [0, 10, 25, 50, 100, 150, 200, 250, args.epochs - 1]
             if e < len(history)]
    with open(args.out, "w") as f:
        f.write("# Learning validation — AMP single-clip imitation\n\n")
        f.write(f"Task: {args.task}, {args.num_envs} envs, clip: "
                f"`{os.path.basename(args.motion)}`, {args.epochs} epochs "
                f"({args.epochs * agent.batch_size:,} env-steps) in {wall:.0f}s "
                f"on {jax.devices()[0].device_kind}.\n\n")
        f.write("Reference qualitative behavior (AMP, Peng et al. 2021): the\n"
                "style (discriminator) reward rises as the policy matches the\n"
                "motion manifold, and episode lengths grow as it stops falling.\n\n")
        f.write("| epoch | disc reward (mean) | disc agent acc | disc demo acc | "
                "episode len | policy KL |\n|---|---|---|---|---|---|\n")
        for e in picks:
            f.write(row(e) + "\n")
        f.write("\nFull history: docs/validation_history.json\n")
    with open(os.path.join(os.path.dirname(args.out), "validation_history.json"), "w") as f:
        json.dump(history, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
