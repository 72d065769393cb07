"""Env layer tests: obs sizes, reset semantics, AMP machinery, task rewards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ase_tpu.envs import parse_task

from ase_tpu.utils import paths

MOTION = paths.default_clip()


def make_cfg(**env_overrides):
    cfg = {
        "env": {
            "numEnvs": 4, "envSpacing": 5, "episodeLength": 30,
            "pdControl": True, "powerScale": 1.0, "controlFrequencyInv": 2,
            "stateInit": "Random", "hybridInitProb": 0.5, "numAMPObsSteps": 10,
            "localRootObs": True, "rootHeightObs": True,
            "keyBodies": ["right_hand", "left_hand", "right_foot", "left_foot",
                           "sword", "shield"],
            "contactBodies": ["right_foot", "left_foot"],
            "terminationHeight": 0.15, "enableEarlyTermination": True,
            "enableSelfCollision": False, "maxContacts": 16,
            "asset": {"assetRoot": "ase/data/assets",
                      "assetFileName": "mjcf/amp_humanoid_sword_shield.xml"},
            "plane": {"staticFriction": 1.0, "dynamicFriction": 1.0,
                      "restitution": 0.0},
            "motion_file": MOTION,
        },
        "sim": {"substeps": 2, "physx": {"num_position_iterations": 4}},
    }
    cfg["env"].update(env_overrides)
    return cfg


@pytest.fixture(scope="module")
def amp_env():
    return parse_task("HumanoidAMP", make_cfg())


def test_obs_action_sizes(amp_env):
    # reference humanoid.py:190-195 / humanoid_amp.py:115-116
    assert amp_env.get_obs_size() == 253
    assert amp_env.get_action_size() == 31
    assert amp_env.get_num_amp_obs() == 1400


def test_initial_state_and_step(amp_env):
    state = amp_env.initial_state(jax.random.PRNGKey(0))
    assert state.obs.shape == (4, 253)
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    step = jax.jit(amp_env.step)
    s2 = step(state, jnp.zeros((4, 31)))
    assert int(s2.progress[0]) == 1
    assert bool(jnp.all(jnp.isfinite(s2.obs)))
    # amp history shifted: row 1 becomes previous row 0
    np.testing.assert_allclose(
        np.asarray(s2.aux["amp_obs"][:, 1]), np.asarray(state.aux["amp_obs"][:, 0]),
        atol=1e-6,
    )


def test_ref_state_init_uses_motion(amp_env):
    state = amp_env.initial_state(jax.random.PRNGKey(2))
    # Random init should give non-default poses (root not exactly at 0.89)
    z = np.asarray(state.phys.root_pos[:, 2])
    assert not np.allclose(z, 0.89), z


def test_reset_done_masked(amp_env):
    state = amp_env.initial_state(jax.random.PRNGKey(3))
    state = state.replace(
        reset_buf=jnp.array([1, 0, 0, 0], jnp.int32),
        progress=jnp.array([10, 10, 10, 10], jnp.int32),
    )
    reset = jax.jit(amp_env.reset_done)
    s2 = reset(state)
    assert int(s2.progress[0]) == 0
    assert int(s2.progress[1]) == 10
    # untouched env keeps its physics state
    np.testing.assert_allclose(
        np.asarray(s2.phys.root_pos[1]), np.asarray(state.phys.root_pos[1]), atol=1e-6
    )


def test_reset_advances_rng_and_aux(amp_env):
    """Regression: reset_done must carry the advanced PRNG and reset aux
    (reset_ref_mask / motion ids) out of the masked merge. Round-1 bug:
    _masked_merge_phys returned the pre-reset state's rng/aux, freezing the
    env RNG (every reset re-sampled the same motion pose) and dropping the
    ref-init bookkeeping the AMP history init depends on."""
    state = amp_env.initial_state(jax.random.PRNGKey(5))
    state = state.replace(reset_buf=jnp.ones(4, jnp.int32))
    reset = jax.jit(amp_env.reset_done)
    s2 = reset(state)
    # the PRNG advanced (reset consumed randomness)
    assert not np.array_equal(np.asarray(state.rng), np.asarray(s2.rng))
    # ref-init bookkeeping propagated (stateInit=Random -> all envs ref-init)
    assert bool(jnp.all(s2.aux["reset_ref_mask"]))
    # two successive resets of the same env sample different motion states
    s3 = reset(s2.replace(reset_buf=jnp.ones(4, jnp.int32)))
    assert not np.allclose(
        np.asarray(s2.phys.root_pos), np.asarray(s3.phys.root_pos)
    )
    # AMP history for ref-init envs comes from the clip, not a repeat of the
    # current frame (rows must differ across the window)
    buf = np.asarray(s2.aux["amp_obs"])
    assert not np.allclose(buf[:, 0], buf[:, 5])


def test_fused_reset_query_parity(amp_env, monkeypatch):
    """The opt-in fused B*steps-row reset motion query
    (ASE_TPU_FUSED_RESET_QUERY=1, single-host experiments only — it breaks
    multi-host GSPMD, see humanoid_amp._sample_ref_init) feeds the same row
    inputs through the same row-wise kernels as the reference's default
    two-query layout (RSI frame + history frames): exactly equal eager;
    under jit the two graphs fuse differently, so allow XLA reassociation
    noise (~2 ulp) but nothing row-shaped."""
    state = amp_env.initial_state(jax.random.PRNGKey(11))
    state = state.replace(reset_buf=jnp.ones(4, jnp.int32))
    monkeypatch.setenv("ASE_TPU_FUSED_RESET_QUERY", "1")
    e_fused = amp_env.reset_done(state)
    s_fused = jax.jit(amp_env.reset_done)(state)
    monkeypatch.delenv("ASE_TPU_FUSED_RESET_QUERY", raising=False)
    e_split = amp_env.reset_done(state)
    s_split = jax.jit(amp_env.reset_done)(state)
    # eager: bit-identical (same math, same op order)
    np.testing.assert_array_equal(
        np.asarray(e_fused.aux["amp_obs"]), np.asarray(e_split.aux["amp_obs"])
    )
    np.testing.assert_array_equal(
        np.asarray(e_fused.phys.root_pos), np.asarray(e_split.phys.root_pos)
    )
    # jit: fusion-level fp noise only — a row misalignment would be O(1e-2)
    np.testing.assert_allclose(
        np.asarray(s_fused.aux["amp_obs"]), np.asarray(s_split.aux["amp_obs"]),
        atol=1e-6, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(s_fused.obs), np.asarray(s_split.obs), atol=1e-6, rtol=0
    )
    # no transient key leaks into the post-reset state
    assert "_reset_hist_amp" not in s_fused.aux


def test_fetch_amp_obs_demo(amp_env):
    demo = amp_env.fetch_amp_obs_demo(jax.random.PRNGKey(4), 8)
    assert demo.shape == (8, 1400)
    assert bool(jnp.all(jnp.isfinite(demo)))
    # per-step blocks differ across the history window (time offsets)
    blocks = np.asarray(demo).reshape(8, 10, 140)
    assert not np.allclose(blocks[:, 0], blocks[:, 5])


def test_heading_task():
    cfg = make_cfg(tarSpeedMin=1.5, tarSpeedMax=1.6, headingChangeStepsMin=10,
                   headingChangeStepsMax=20, enableRandHeading=True,
                   enableTaskObs=True, stateInit="Default")
    env = parse_task("HumanoidHeading", cfg)
    assert env.get_obs_size() == 258  # 253 + 5
    state = env.initial_state(jax.random.PRNGKey(0))
    s2 = jax.jit(env.step)(state, jnp.zeros((4, 31)))
    assert bool(jnp.all(jnp.isfinite(s2.rew)))
    assert float(jnp.max(s2.rew)) <= 1.0 + 1e-5


def test_view_motion():
    env = parse_task("HumanoidViewMotion", make_cfg())
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros((4, 31)))
    # kinematic playback keeps body positions matching the clip (finite, above ground)
    assert bool(jnp.all(jnp.isfinite(state.body_pos)))
    assert float(jnp.min(state.body_pos[..., 2])) > -0.1


def test_getup_env():
    cfg = make_cfg(stateInit="Hybrid", recoveryEpisodeProb=0.2,
                   recoverySteps=6, fallInitProb=0.5)
    env = parse_task("HumanoidAMPGetup", cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    s2 = jax.jit(env.step)(state, jnp.zeros((4, 31)))
    assert bool(jnp.all(jnp.isfinite(s2.obs)))


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


def test_chunked_reset_compaction():
    """Chunked reset_done resets ALL flagged envs in one call (draining
    multi-chunk storms within the step, like the reference's full-width
    reset_idx) and leaves unflagged envs untouched — including the env-0
    aliasing corner of the scatter compaction."""
    cfg = make_cfg(numEnvs=8, resetChunk=4, stateInit="Default")
    env = parse_task("HumanoidAMP", cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    state = state.replace(progress=jnp.full(8, 7, jnp.int32))

    # env 0 flagged (the alias corner) + 2 others, under the chunk size
    flags = jnp.zeros(8, jnp.int32).at[jnp.array([0, 3, 6])].set(1)
    out = jax.jit(env.reset_done)(state.replace(reset_buf=flags))
    prog = np.asarray(out.progress)
    assert list(np.where(prog == 0)[0]) == [0, 3, 6]
    assert np.all(np.asarray(out.reset_buf) == 0)
    # unflagged envs' physics untouched
    np.testing.assert_array_equal(
        np.asarray(out.phys.root_pos[1]), np.asarray(state.phys.root_pos[1]))

    # reset storm: more flagged than the chunk. The drain loop must clear
    # the whole queue in ONE reset_done call — spilled envs would re-log a
    # 1-step game and cut value bootstrapping every step while waiting
    # (observed live: Strike HLC training pinned at game_length 1.0 when
    # contact-failure terminations exceeded the chunk).
    out2 = jax.jit(env.reset_done)(state.replace(reset_buf=jnp.ones(8, jnp.int32)))
    prog2 = np.asarray(out2.progress)
    assert int(np.sum(prog2 == 0)) == 8
    assert np.all(np.asarray(out2.reset_buf) == 0)


def test_reset_storm_drains_partial_overflow():
    """Storm drain with a non-multiple-of-chunk queue (7 flagged, chunk 2):
    all flagged envs reset, the unflagged one bit-identical."""
    cfg = make_cfg(numEnvs=8, resetChunk=2, stateInit="Random")
    env = parse_task("HumanoidAMP", cfg)
    state = env.initial_state(jax.random.PRNGKey(1))
    before3 = np.asarray(state.phys.root_pos[3]).copy()
    flags = jnp.ones(8, jnp.int32).at[3].set(0)
    out = jax.jit(env.reset_done)(
        state.replace(reset_buf=flags, progress=jnp.full(8, 19, jnp.int32)))
    assert np.all(np.asarray(out.reset_buf) == 0)
    prog = np.asarray(out.progress)
    assert prog[3] == 19 and int(np.sum(prog == 0)) == 7
    np.testing.assert_array_equal(np.asarray(out.phys.root_pos[3]), before3)
