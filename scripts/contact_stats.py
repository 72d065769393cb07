"""Measure the active-contact-count distribution on a realistic workload.

Drives the getup env with random actions (conservative: flailing + ground
impacts create more simultaneous contacts than a trained policy) and, at
every tick, counts candidates the solver would act on
(depth > -contact_offset, i.e. penetrating + speculative-gap) using a LARGE
detection budget. Prints quantiles and the overflow probability for a range
of contact budgets K — the data behind choosing SimConfig.max_contacts.

Usage: python -u scripts/contact_stats.py [--envs 1024] [--steps 150]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
os.environ["ASE_TPU_MAX_CONTACTS"] = "64"   # wide detection budget

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=150)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from ase_tpu.envs import parse_task
    from ase_tpu.physics import engine
    from ase_tpu.utils import paths

    cfg = yaml.safe_load(open(os.path.join(
        _ROOT, "data/cfg/humanoid_ase_sword_shield_getup.yaml")))
    cfg["env"]["numEnvs"] = args.envs
    cfg["env"]["motion_file"] = paths.default_clip()
    env = parse_task("HumanoidAMPGetup", cfg)
    margin = env.sim_cfg.solver.contact_offset

    @jax.jit
    def roll(state, rng):
        def body(carry, _):
            state, rng = carry
            rng, k = jax.random.split(rng)
            state = env.reset_done(state)
            a = jax.random.uniform(
                k, (args.envs, env.get_action_size()), minval=-1.0, maxval=1.0)
            state = env.step(state, a)
            kin = engine._fk(env.model, state.phys)
            contacts = engine._detect_contacts(
                env.model, env.sim_cfg, env._tables, state.phys, kin,
                jnp.ones(args.envs))
            n_ok = jnp.abs(
                jnp.sum(jnp.square(contacts.normal), axis=-1) - 1.0) < 0.1
            active = jnp.sum(
                (contacts.depth > -margin) & n_ok, axis=1)        # (B,)
            return (state, rng), active

        (_, _), counts = jax.lax.scan(body, (state, rng), None,
                                      length=args.steps)
        return counts                                             # (T, B)

    state = env.initial_state(jax.random.PRNGKey(0))
    counts = np.asarray(roll(state, jax.random.PRNGKey(1))).ravel()
    print(f"samples: {counts.size}  (envs={args.envs} steps={args.steps}, "
          f"detection budget 64, margin={margin})")
    for p in (50, 90, 99, 99.9, 99.99):
        print(f"  p{p}: {np.percentile(counts, p):.0f}")
    print(f"  max: {counts.max()}")
    for K in (12, 16, 20, 24, 32):
        print(f"  overflow P(active > {K}): {(counts > K).mean():.5f}")


if __name__ == "__main__":
    main()
