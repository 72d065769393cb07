"""Motion library tests: format loading, interpolation goldens, native cache."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ase_tpu.motion import motion_lib as ml
from ase_tpu.motion import retarget, skeleton as sk
from ase_tpu.physics import dynamics, mjcf

ASSET = "data/assets/mjcf/amp_humanoid_sword_shield.xml"
from ase_tpu.utils import paths

CLIP = paths.default_clip()
KEY_BODIES = ["right_hand", "left_hand", "right_foot", "left_foot", "sword", "shield"]


@pytest.fixture(scope="module")
def model():
    return mjcf.load_mjcf(ASSET)


@pytest.fixture(scope="module")
def lib(model):
    key_ids = [model.body_index(b) for b in KEY_BODIES]
    return ml.load_motion_lib(CLIP, model.dof_body_ids, model.dof_offsets, key_ids,
                              use_cache=False)


def test_load_reference_format(lib):
    assert lib.gts.shape[1] == 17
    assert lib.dvs.shape[1] == 31
    assert float(lib.lengths[0]) > 3.0  # idle clip is a few seconds


def test_skeleton_matches_mjcf(model):
    tree, *_ = ml.load_motion_npy(CLIP)
    assert tree.node_names == model.body_names
    np.testing.assert_allclose(
        tree.local_translation, np.asarray(model.body_ipos), atol=1e-6
    )


def test_exact_frame_query(lib):
    """Querying exactly at a frame time returns that frame's values."""
    dt = float(lib.dt[0])
    ids = jnp.zeros(3, jnp.int32)
    times = jnp.asarray([0.0, 5 * dt, 20 * dt])
    ms = ml.get_motion_state(lib, ids, times)
    for i, f in enumerate([0, 5, 20]):
        np.testing.assert_allclose(
            np.asarray(ms["root_pos"][i]), np.asarray(lib.gts[f, 0]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ms["dof_vel"][i]), np.asarray(lib.dvs[f]), atol=1e-5
        )


def test_packed_query_parity(lib, monkeypatch):
    """The packed (F, Dp) fast path is bit-identical to the per-field path."""
    assert lib.packed is not None and lib.meta is not None
    rng = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(rng)
    ids = ml.sample_motions(lib, k1, 64)
    times = ml.sample_time(lib, k2, ids)
    # include exact-frame and clip-end edge cases
    dt = float(lib.dt[0])
    times = times.at[:3].set(jnp.asarray([0.0, 5 * dt, float(lib.lengths[0])]))
    fast = ml.get_motion_state(lib, ids, times)
    monkeypatch.setenv("ASE_TPU_UNPACKED_MOTION", "1")
    slow = ml.get_motion_state(lib, ids, times)
    for k in slow:
        np.testing.assert_array_equal(
            np.asarray(fast[k]), np.asarray(slow[k]), err_msg=k)


def test_interpolation_midpoint(lib):
    """Halfway between frames, positions are the arithmetic midpoint."""
    dt = float(lib.dt[0])
    ids = jnp.zeros(1, jnp.int32)
    ms = ml.get_motion_state(lib, ids, jnp.asarray([10.5 * dt]))
    expected = 0.5 * (np.asarray(lib.gts[10, 0]) + np.asarray(lib.gts[11, 0]))
    np.testing.assert_allclose(np.asarray(ms["root_pos"][0]), expected, atol=1e-4)


def test_sim_fk_matches_motion(model, lib):
    """Golden: set sim state from motion -> FK reproduces motion key bodies."""
    key_ids = [model.body_index(b) for b in KEY_BODIES]
    ids = jnp.zeros(2, jnp.int32)
    times = jnp.asarray([0.3, 1.7])
    ms = ml.get_motion_state(lib, ids, times)
    for i in range(2):
        s = dynamics.default_state(model)
        s = dynamics.set_dof_state(model, s, ms["dof_pos"][i], ms["dof_vel"][i])
        s = dynamics.set_root_state(
            s, ms["root_pos"][i], ms["root_rot"][i],
            ms["root_vel"][i], ms["root_ang_vel"][i],
        )
        kin = dynamics.fk(model, s)
        kp = np.asarray(kin.body_pos[jnp.asarray(key_ids)])
        np.testing.assert_allclose(kp, np.asarray(ms["key_pos"][i]), atol=2e-3)


def test_weighted_sampling(lib):
    rng = jax.random.PRNGKey(0)
    ids = ml.sample_motions(lib, rng, 256)
    assert ids.shape == (256,)
    assert int(ids.max()) < lib.num_motions
    t = ml.sample_time(lib, rng, ids, truncate_time=0.3)
    assert float(t.max()) <= float(lib.lengths.max()) - 0.3 + 1e-5


def test_native_cache_roundtrip(model, tmp_path):
    from ase_tpu import native as native_mod

    mc = native_mod.get_motion_cache()
    if mc is None:
        pytest.skip("native toolchain unavailable")
    path = str(tmp_path / "test.msc")
    arrays = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.asarray([7, 8, 9], dtype=np.int32),
    }
    mc.pack(path, list(arrays), [a.dtype.str for a in arrays.values()],
            [a.shape for a in arrays.values()], list(arrays.values()))
    entries, capsule = mc.load(path)
    out = {
        name: np.frombuffer(view, dtype=np.dtype(dt)).reshape(shape)
        for (name, dt, shape, view) in entries
    }
    np.testing.assert_array_equal(out["a"], arrays["a"])
    np.testing.assert_array_equal(out["b"], arrays["b"])


def test_retarget_identity(model):
    """Retargeting a motion onto the SAME skeleton with identity mapping
    reproduces the original global rotations."""
    tree, lr, rt, fps, gv, gav = ml.load_motion_npy(CLIP)
    tpose = np.tile(np.array([0, 0, 0, 1], np.float32), (tree.num_joints, 1))
    mapping = {n: n for n in tree.node_names}
    out_lr, out_rt = retarget.retarget_motion(
        tree, lr[:10], rt[:10], tpose, tree, tpose,
        np.array([0, 0, 0.89], np.float32), mapping,
        np.array([0, 0, 0, 1], np.float32), 1.0,
    )
    g0, _ = sk.np_fk(tree, lr[:10], rt[:10])
    g1, _ = sk.np_fk(tree, out_lr, out_rt)
    dot = np.abs(np.sum(g0 * g1, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
