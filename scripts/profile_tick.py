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


if __name__ == "__main__":
    main()
