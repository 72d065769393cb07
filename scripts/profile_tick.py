"""Profile the sim tick + epoch phases on the real TPU chip.

Usage: python scripts/profile_tick.py [--trace]
One TPU client at a time (loopback relay); run solo.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import yaml


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0  # ms


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from ase_tpu.envs import parse_task

    num_envs = int(os.environ.get("PROF_NUM_ENVS", 4096))
    cfg = yaml.safe_load(open(os.path.join(root, "data/cfg/humanoid_ase_sword_shield_getup.yaml")))
    cfg["env"]["numEnvs"] = num_envs
    from ase_tpu.utils import paths

    cfg["env"]["motion_file"] = paths.default_clip()
    cfg["env"]["enableSelfCollision"] = True
    env = parse_task("HumanoidAMP", cfg)

    from ase_tpu.physics import engine

    state = env.initial_state(jax.random.PRNGKey(0))
    actions = jnp.zeros((num_envs, env.get_action_size()))

    # sim tick only
    tick = jax.jit(lambda phys, tgt: engine.step_batched(
        env.model, env.sim_cfg, env._tables, phys, tgt).state)
    tgt = env._pd_action_offset[None] + env._pd_action_scale[None] * actions
    t = timeit(lambda: tick(state.phys, tgt), n=30)
    print(f"sim tick (2 substeps): {t:.2f} ms  ({num_envs / t * 1000:.0f} env-ticks/s)")

    # env control step (2 ticks + obs/reward/reset)
    step = jax.jit(env.step)
    t = timeit(lambda: step(state, actions), n=20)
    print(f"env control step: {t:.2f} ms")

    # reset_done
    rd = jax.jit(env.reset_done)
    t = timeit(lambda: rd(state), n=20)
    print(f"reset_done: {t:.2f} ms")

    if "--trace" in sys.argv:
        outdir = os.path.join(root, "output/profile_tick")
        jax.profiler.start_trace(outdir)
        for _ in range(5):
            s = tick(state.phys, tgt)
        jax.block_until_ready(s)
        jax.profiler.stop_trace()
        print("trace written to", outdir)


def main_epoch():
    """Time the train epoch's rollout and update phases separately (the
    split-epoch jits), on the bench workload. Use --trace-epoch for a trace
    of one update phase."""
    os.environ["ASE_TPU_SPLIT_EPOCH"] = "1"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import yaml

    from ase_tpu.envs import parse_task
    from ase_tpu.learning.ase_agent import ASEAgent
    from ase_tpu.utils import paths

    num_envs = int(os.environ.get("PROF_NUM_ENVS", 4096))
    cfg = yaml.safe_load(
        open(os.path.join(root, "data/cfg/humanoid_ase_sword_shield_getup.yaml")))
    cfg["env"]["numEnvs"] = num_envs
    cfg["env"]["motion_file"] = paths.default_dataset()
    cfg_train = yaml.safe_load(
        open(os.path.join(root, "data/cfg/train/rlg/ase_humanoid.yaml")))
    c = cfg_train["params"]["config"]
    c["horizon_length"] = 32
    c["minibatch_size"] = min(16384, num_envs * 32)
    c["mixed_precision"] = os.environ.get("BENCH_BF16", "1") == "1"

    env = parse_task("HumanoidAMPGetup", cfg)
    agent = ASEAgent(env, cfg_train)
    rng = jax.random.PRNGKey(0)
    ts = agent.init_train_state(rng)
    env_state = env.initial_state(jax.random.PRNGKey(1))

    roll_jit = jax.jit(agent._rollout_phase_impl)
    upd_jit = jax.jit(agent._update_phase_impl)

    t0 = time.time()
    ts2, env_state2, dataset, rmetrics = roll_jit(ts, env_state)
    jax.block_until_ready(rmetrics)
    print(f"rollout compile: {time.time() - t0:.1f}s")
    t0 = time.time()
    _, metrics = upd_jit(ts2, dataset)
    jax.block_until_ready(metrics)
    print(f"update compile: {time.time() - t0:.1f}s")

    t = timeit(lambda: roll_jit(ts, env_state)[3], n=5)
    print(f"rollout phase: {t:.1f} ms  ({num_envs * 32 / t * 1000:.0f} steps/s)")
    t = timeit(lambda: upd_jit(ts2, dataset)[1], n=5)
    print(f"update phase: {t:.1f} ms")

    if "--trace-epoch" in sys.argv:
        outdir = os.path.join(root, "output/profile_epoch")
        jax.profiler.start_trace(outdir)
        _, m = upd_jit(ts2, dataset)
        jax.block_until_ready(m)
        _, _, _, rm = roll_jit(ts, env_state)
        jax.block_until_ready(rm)
        jax.profiler.stop_trace()
        print("trace written to", outdir)


if __name__ == "__main__":
    if "--epoch" in sys.argv:
        main_epoch()
    else:
        main()
