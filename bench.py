"""Benchmark: humanoid env-steps/sec on the flagship AMP/ASE training path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json): >=1M env-steps/sec on a v5p-8 (8 chips) at 4096
envs => 125k env-steps/sec/chip. vs_baseline = measured_per_chip / 125000.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def main():
    import jax
    import jax.numpy as jnp
    import yaml

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    horizon = int(os.environ.get("BENCH_HORIZON", 32))
    epochs = int(os.environ.get("BENCH_EPOCHS", 5))

    from ase_tpu.envs import parse_task
    from ase_tpu.learning.ase_agent import ASEAgent

    from ase_tpu.utils import paths

    root = os.path.dirname(os.path.abspath(__file__))
    cfg = yaml.safe_load(open(os.path.join(root, "data/cfg/humanoid_ase_sword_shield_getup.yaml")))
    cfg["env"]["numEnvs"] = num_envs
    # The benchmark workload is the full 87-clip dataset (vendored). A missing
    # dataset is an error, not a silent fallback to a lighter motion library.
    cfg["env"]["motion_file"] = os.environ.get("BENCH_MOTION_FILE", paths.default_dataset())
    if not os.path.exists(cfg["env"]["motion_file"]):
        raise FileNotFoundError(
            f"benchmark motion dataset missing: {cfg['env']['motion_file']}")
    cfg["env"]["enableSelfCollision"] = (
        os.environ.get("BENCH_SELF_COLLISION", "1") == "1"
    )
    cfg["env"]["resetChunk"] = int(os.environ.get("BENCH_RESET_CHUNK", 512))

    cfg_train = yaml.safe_load(open(os.path.join(root, "data/cfg/train/rlg/ase_humanoid.yaml")))
    c = cfg_train["params"]["config"]
    c["horizon_length"] = horizon
    c["minibatch_size"] = min(16384, num_envs * horizon)
    # bf16 matmuls with f32 master weights (MXU ~4x f32 throughput)
    c["mixed_precision"] = os.environ.get("BENCH_BF16", "1") == "1"
    # keep AMP buffers proportional on small runs
    if num_envs < 1024:
        c["amp_obs_demo_buffer_size"] = 4096
        c["amp_replay_buffer_size"] = 4096

    env = parse_task("HumanoidAMPGetup", cfg)
    agent = ASEAgent(env, cfg_train)

    rng = jax.random.PRNGKey(0)
    ts = agent.init_train_state(rng)
    env_state = env.initial_state(jax.random.PRNGKey(1))

    # multi-chip: shard the env batch over all devices (replicated train
    # state, XLA-inserted collectives); per-chip throughput is then honest
    n_chips = jax.device_count()
    if n_chips > 1:
        agent.setup_mesh()
        ts, env_state = agent._place_states(ts, env_state)
        print(f"# sharded over {n_chips} devices", file=sys.stderr)

    # compile
    t0 = time.time()
    ts, env_state, metrics = agent.train_epoch(ts, env_state)
    jax.block_until_ready(metrics)
    compile_s = time.time() - t0
    print(f"# compile: {compile_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(epochs):
        ts, env_state, metrics = agent.train_epoch(ts, env_state)
    jax.block_until_ready(metrics)
    wall = time.time() - t0

    steps = epochs * horizon * num_envs
    sps = steps / wall
    per_chip = sps / n_chips
    out = {
        "metric": "ase_train_env_steps_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "env-steps/s/chip (full ASE train epoch, 4096 envs)",
        "vs_baseline": round(per_chip / 125000.0, 4),
    }
    print(json.dumps(out))


def _is_transient(exc: BaseException) -> bool:
    """Infra transients seen on this deployment: the remote-compile service
    occasionally drops the response mid-body, and a freshly-killed TPU client
    leaves the relay in FAILED_PRECONDITION for ~2 minutes."""
    msg = f"{type(exc).__name__}: {exc}"
    return any(
        s in msg
        for s in ("remote_compile", "FAILED_PRECONDITION", "UNAVAILABLE",
                  "DEADLINE_EXCEEDED", "response body closed")
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — retry only classified transients
        if os.environ.get("BENCH_RETRIED") == "1" or not _is_transient(e):
            raise
        print(f"# transient backend error, retrying once in 150s: {e}",
              file=sys.stderr)
        time.sleep(150)  # FAILED_PRECONDITION window after a killed client is ~2 min
        os.environ["BENCH_RETRIED"] = "1"
        # re-exec with the original interpreter flags preserved (notably -u:
        # TPU runs are launched unbuffered with output redirected to a log)
        os.execv(sys.executable, [sys.executable] + sys.orig_argv[1:])
