"""Trace ONE epoch of the exact bench.py workload (bf16 update on).

Writes a jax.profiler trace into output/profile_bench/ for the TensorBoard
trace viewer; analyze the vm.trace.json.gz directly (see docs/PERF.md).
Usage: python scripts/profile_bench_epoch.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import yaml

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    horizon = int(os.environ.get("BENCH_HORIZON", 32))

    from ase_tpu.envs import parse_task
    from ase_tpu.learning.ase_agent import ASEAgent
    from ase_tpu.utils import paths

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = yaml.safe_load(
        open(os.path.join(root, "data/cfg/humanoid_ase_sword_shield_getup.yaml")))
    cfg["env"]["numEnvs"] = num_envs
    cfg["env"]["motion_file"] = paths.default_dataset()
    cfg["env"]["enableSelfCollision"] = True
    cfg["env"]["resetChunk"] = int(os.environ.get("BENCH_RESET_CHUNK", 512))

    cfg_train = yaml.safe_load(
        open(os.path.join(root, "data/cfg/train/rlg/ase_humanoid.yaml")))
    c = cfg_train["params"]["config"]
    c["horizon_length"] = horizon
    c["minibatch_size"] = min(16384, num_envs * horizon)
    c["mixed_precision"] = os.environ.get("BENCH_BF16", "1") == "1"

    env = parse_task("HumanoidAMPGetup", cfg)
    agent = ASEAgent(env, cfg_train)

    ts = agent.init_train_state(jax.random.PRNGKey(0))
    env_state = env.initial_state(jax.random.PRNGKey(1))

    t0 = time.time()
    ts, env_state, metrics = agent.train_epoch(ts, env_state)
    jax.block_until_ready(metrics)
    print(f"# compile: {time.time() - t0:.1f}s", file=sys.stderr)

    # warm epochs, then trace one
    for _ in range(2):
        ts, env_state, metrics = agent.train_epoch(ts, env_state)
    jax.block_until_ready(metrics)

    out_dir = os.path.join(root, "output", "profile_bench")
    jax.profiler.start_trace(out_dir)
    ts, env_state, metrics = agent.train_epoch(ts, env_state)
    jax.block_until_ready(metrics)
    jax.profiler.stop_trace()

    t0 = time.time()
    for _ in range(3):
        ts, env_state, metrics = agent.train_epoch(ts, env_state)
    jax.block_until_ready(metrics)
    wall = (time.time() - t0) / 3
    print(f"# epoch wall: {wall * 1e3:.1f} ms "
          f"({horizon * num_envs / wall / 1e3:.1f}k steps/s)", file=sys.stderr)

    # phase split: time the two epoch jits separately (they are the same
    # compiled modules the fused epoch calls — see common_agent.train_epoch)
    roll_jit = jax.jit(agent._rollout_phase_impl)
    upd_jit = jax.jit(agent._update_phase_impl)
    ts2, env2, dataset, _ = roll_jit(ts, env_state)
    ts2, _ = upd_jit(ts2, dataset)
    jax.block_until_ready(ts2.params)
    t0 = time.time()
    for _ in range(3):
        _, _, dataset, rm = roll_jit(ts, env_state)
    jax.block_until_ready(rm)
    t_roll = (time.time() - t0) / 3
    t0 = time.time()
    for _ in range(3):
        ts3, m = upd_jit(ts, dataset)
    jax.block_until_ready(m)
    t_upd = (time.time() - t0) / 3
    print(f"# phase split: rollout {t_roll * 1e3:.1f} ms, "
          f"update {t_upd * 1e3:.1f} ms", file=sys.stderr)
    print(f"# trace in {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
