"""Quantitative LLC skill-space evaluation (VERDICT r3 #5 — the ASE paper's
core claim: a pretrained low-level controller spans a diverse, reusable skill
space, arXiv:2205.01906 §6.1).

Three measurements on the shipped LLC checkpoint:

1. **Latent sweep** — N envs, each pinned to ONE fixed latent for the whole
   rollout (no scheduled resampling): per-latent discriminator reward (style:
   does the skill look like the mocap manifold?) and encoder reward (skill
   consistency: is the latent recoverable from the motion it produces?)
   distributions over the latent sphere.
2. **Trajectory diversity** — per-latent mean root velocity: the spread
   (std + mean pairwise distance) over latents is the paper's qualitative
   "different z → different behavior" claim, quantified.
3. **Getup success** — from the AMPGetup env's generated fall states, the
   fraction of envs that return to standing within the recovery window
   (reference humanoid_amp_getup.py:42-76 fall generation).

Writes the stats + raw per-latent arrays to docs/validation_llc_skills.json
(the docs/VALIDATION.md §"LLC skill space" section is curated from them).

Usage: python -u scripts/eval_llc_skills.py [--envs 256] [--steps 300]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

LLC = os.path.join(_ROOT, "data/models/ase_llc_reallusion_sword_shield.ckpt.npz")


def build(task, cfg_env, num_envs):
    import yaml

    from ase_tpu.envs import parse_task
    from ase_tpu.learning.ase_agent import ASEAgent

    cfg = yaml.safe_load(open(os.path.join(_ROOT, "data/cfg", cfg_env)))
    cfg["env"]["numEnvs"] = num_envs
    cfg["env"]["motion_file"] = os.path.join(
        _ROOT, "data/motions/reallusion_sword_shield/"
        "dataset_reallusion_sword_shield.yaml")
    cfg_train = yaml.safe_load(
        open(os.path.join(_ROOT, "data/cfg/train/rlg/ase_humanoid.yaml")))
    # eval only — satisfy the training batch-divisibility invariant at any
    # env count (no update phase ever runs here)
    c = cfg_train["params"]["config"]
    c["horizon_length"] = 4
    c["minibatch_size"] = num_envs * 4
    env = parse_task(task, cfg)
    agent = ASEAgent(env, cfg_train)
    return env, agent


def fixed_latent_rollout(env, agent, ts, z, steps, rng, env_state=None,
                         reset_done=True):
    """Deterministic rollout with per-env PINNED latents. Returns per-env
    (disc_reward_mean, enc_reward_mean, mean_root_vel_xy, fall_frac,
    final_root_z, max_root_z_tail). ``reset_done=False`` keeps terminated
    envs rolling in place (the getup eval must not respawn fallen envs)."""
    import jax
    import jax.numpy as jnp

    if env_state is None:
        env_state = env.initial_state(rng)

    @jax.jit
    def roll(ts, env_state, z):
        def body(carry, _):
            env_state, acc = carry
            if reset_done:
                env_state = env.reset_done(env_state)
            obs_n = (ts.obs_rms.normalize(env_state.obs)
                     if agent.normalize_input else env_state.obs)
            mu, _ = agent.network.apply(
                ts.params, obs_n, z, method=agent.network.eval_actor)
            env_state = env.step(env_state, jnp.clip(mu, -1.0, 1.0))
            amp_obs = env.amp_obs_flat(env_state)
            disc_r = agent._calc_disc_rewards(ts, amp_obs)[:, 0]
            enc_r = agent._calc_enc_rewards(ts, amp_obs, z)[:, 0]
            root_v = env_state.phys.u[:, 0:2]
            root_z = env_state.phys.root_pos[:, 2]
            # terminate_buf only (falls / contact failures) — reset_buf also
            # fires on the episode-length timeout, which at steps >= max
            # episode length would count every latent by construction
            fallen = (env_state.terminate_buf > 0).astype(jnp.float32)
            acc = (
                acc[0] + disc_r, acc[1] + enc_r, acc[2] + root_v,
                acc[3] + fallen, jnp.maximum(acc[4], root_z),
            )
            return (env_state, acc), root_z

        B = z.shape[0]
        acc0 = (jnp.zeros(B), jnp.zeros(B), jnp.zeros((B, 2)),
                jnp.zeros(B), jnp.zeros(B))
        (env_state, acc), root_z_t = jax.lax.scan(
            body, (env_state, acc0), None, length=steps)
        return env_state, acc, root_z_t

    env_state, acc, root_z_t = roll(ts, env_state, z)
    import numpy as np
    disc, enc, vel, falls, max_z = (np.asarray(a) for a in acc)
    root_z_t = np.asarray(root_z_t)                    # (T, B)
    return {
        "disc_reward": disc / steps,
        "enc_reward": enc / steps,
        "mean_vel": vel / steps,                       # (B, 2)
        "fall_count": falls,
        "max_root_z": max_z,
        "final_root_z": root_z_t[-1],
        "tail_max_root_z": root_z_t[-30:].max(axis=0),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--getup-envs", type=int, default=512)
    ap.add_argument("--getup-steps", type=int, default=150)
    ap.add_argument("--llc", type=str, default=LLC)
    ap.add_argument("--out", type=str,
                    default=os.path.join(_ROOT, "docs/validation_llc_skills.json"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ase_tpu.learning import checkpoint as ckpt
    from ase_tpu.models import networks

    t0 = time.time()

    # ---- 1+2: latent sweep on the plain AMP env, default standing init ----
    env, agent = build("HumanoidAMP", "humanoid_ase_sword_shield.yaml",
                       args.envs)
    ts = agent.init_train_state(jax.random.PRNGKey(0))
    ts = ckpt.restore(args.llc, ts, strict=False)
    z = networks.sample_latents(jax.random.PRNGKey(7), args.envs,
                                agent._latent_dim)
    sweep = fixed_latent_rollout(env, agent, ts, z, args.steps,
                                 jax.random.PRNGKey(1))
    print(f"latent sweep done in {time.time()-t0:.0f}s", flush=True)

    disc, enc = sweep["disc_reward"], sweep["enc_reward"]
    vel = sweep["mean_vel"]
    speed = np.linalg.norm(vel, axis=-1)
    # mean pairwise distance between per-latent mean velocities
    d = vel[:, None, :] - vel[None, :, :]
    pair = np.sqrt((d ** 2).sum(-1))
    iu = np.triu_indices(args.envs, 1)

    def q(x):
        return {
            "mean": float(np.mean(x)), "p10": float(np.percentile(x, 10)),
            "p50": float(np.percentile(x, 50)),
            "p90": float(np.percentile(x, 90)),
        }

    # a handful of latents can destabilize the solver (mean root speed tens
    # of m/s); publish BOTH the raw spread and a stable-subset spread so the
    # diversity claim is not carried by blow-ups
    stable = speed < 5.0
    vs, ps = vel[stable], pair[np.ix_(stable, stable)]
    ius = np.triu_indices(int(stable.sum()), 1)
    stats = {
        "n_latents": args.envs, "steps": args.steps,
        "disc_reward": q(disc), "enc_reward": q(enc),
        "speed": q(speed),
        "vel_std_over_latents": [float(s) for s in vel.std(axis=0)],
        "mean_pairwise_vel_dist": float(pair[iu].mean()),
        "n_unstable_latents_speed_gt_5": int((~stable).sum()),
        "stable_vel_std_over_latents": [float(s) for s in vs.std(axis=0)],
        "stable_mean_pairwise_vel_dist": float(ps[ius].mean()),
        "fall_frac": float((sweep["fall_count"] > 0).mean()),
    }

    # ---- 3: getup success from generated fall states ----
    t1 = time.time()
    genv, gagent = build("HumanoidAMPGetup",
                         "humanoid_ase_sword_shield_getup.yaml",
                         args.getup_envs)
    gts = gagent.init_train_state(jax.random.PRNGKey(0))
    gts = ckpt.restore(args.llc, gts, strict=False)
    st = genv.initial_state(jax.random.PRNGKey(2))
    # force EVERY env onto a cached fall pose (reference _generate_fall_states)
    idx = jax.random.randint(jax.random.PRNGKey(3), (args.getup_envs,), 0,
                             genv._fall_states.root_pos.shape[0])
    fall_phys = jax.tree_util.tree_map(lambda x: x[idx], genv._fall_states)
    st = st.replace(phys=fall_phys)
    st = genv._refresh_kinematics(st)
    # long recovery window: no early termination during the eval
    st = st.replace(progress=jnp.zeros_like(st.progress))
    aux = dict(st.aux)
    if "recovery_counter" in aux:
        aux["recovery_counter"] = jnp.full(
            (args.getup_envs,), args.getup_steps, jnp.int32)
        st = st.replace(aux=aux)
    gz = networks.sample_latents(jax.random.PRNGKey(11), args.getup_envs,
                                 gagent._latent_dim)
    start_z = np.asarray(st.phys.root_pos[:, 2])
    getup = fixed_latent_rollout(genv, gagent, gts, gz, args.getup_steps,
                                 jax.random.PRNGKey(4), env_state=st,
                                 reset_done=False)
    fallen0 = start_z < 0.5
    recovered = getup["tail_max_root_z"] > 0.65
    succ = float(recovered[fallen0].mean()) if fallen0.any() else float("nan")
    stats["getup"] = {
        "n_fall_states": int(fallen0.sum()),
        "recovery_steps": args.getup_steps,
        "success_rate_tail_root_z_gt_0.65": succ,
        "median_start_root_z": float(np.median(start_z[fallen0])),
        "median_tail_max_root_z": float(
            np.median(getup["tail_max_root_z"][fallen0])),
    }
    print(f"getup eval done in {time.time()-t1:.0f}s", flush=True)

    out = {
        "stats": stats,
        "per_latent": {
            "disc_reward": disc.tolist(), "enc_reward": enc.tolist(),
            "mean_vel": vel.tolist(),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(stats, indent=1))
    return stats


if __name__ == "__main__":
    main()
