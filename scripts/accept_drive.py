"""One-shot acceptance drive: bench throughput + shipped-LLC quality eval.

Runs the two TPU product drives the verify recipe prescribes and prints a
single JSON summary:
  {"bench_steps_per_sec": ..., "vs_baseline": ..., "llc_mean_return": ...,
   "llc_mean_length": ..., "llc_episodes": ...}

Usage: python scripts/accept_drive.py
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    env = dict(os.environ)
    bench = subprocess.run(
        [sys.executable, "-u", os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, timeout=2400)
    bench_json = None
    for line in bench.stdout.splitlines():
        if line.startswith("{"):
            bench_json = json.loads(line)
    if bench_json is None:
        print(bench.stdout[-2000:], file=sys.stderr)
        print(bench.stderr[-2000:], file=sys.stderr)
        raise SystemExit("bench produced no JSON line")

    sys.path.insert(0, ROOT)
    import yaml

    from ase_tpu.envs import parse_task
    from ase_tpu.learning.ase_agent import ASEAgent
    from ase_tpu.learning.players import ASEPlayer
    from ase_tpu.utils import paths

    cfg = yaml.safe_load(open(os.path.join(
        ROOT, "data/cfg/humanoid_ase_sword_shield_getup.yaml")))
    cfg["env"]["numEnvs"] = 256
    cfg["env"]["motion_file"] = paths.default_dataset()
    cfg_train = yaml.safe_load(open(os.path.join(
        ROOT, "data/cfg/train/rlg/ase_humanoid.yaml")))
    cfg_train["params"]["config"]["minibatch_size"] = 4096
    cfg_train["params"]["config"]["amp_obs_demo_buffer_size"] = 4096
    cfg_train["params"]["config"]["amp_replay_buffer_size"] = 4096

    env_ = parse_task("HumanoidAMPGetup", cfg)
    agent = ASEAgent(env_, cfg_train)
    player = ASEPlayer(agent, print_stats=False)
    ts = player.restore(os.path.join(
        ROOT, "data/models/ase_llc_reallusion_sword_shield.ckpt.npz"))
    stats = player.run(num_steps=300, ts=ts)

    print(json.dumps({
        "bench_steps_per_sec": bench_json["value"],
        "vs_baseline": bench_json["vs_baseline"],
        "llc_mean_return": round(stats["mean_return"], 1),
        "llc_mean_length": round(stats["mean_length"], 1),
        "llc_episodes": stats["episodes"],
    }))


if __name__ == "__main__":
    main()
