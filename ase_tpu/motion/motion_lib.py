"""Device-resident motion library with fully jittable state queries.

Capability-parity with the reference ``ase/utils/motion_lib.py`` (weighted
clip sampling, uniform time sampling with truncation, bilinear frame blending
with slerp, local-rotation→dof conversion), re-designed TPU-first:

* all clips are concatenated into flat device arrays once at load time
  (the reference does this too, but keeps per-clip Python objects around and
  reaches into them via a reflection cache — here the arrays ARE the library);
* ``get_motion_state`` / ``sample_*`` are pure functions of a pytree, so they
  can be called *inside* a jitted env step (reference state init happens inside
  the rollout ``lax.scan`` with no host round-trip);
* randomness comes from explicit JAX PRNG keys.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import struct

from ase_tpu.motion import skeleton as sk
from ase_tpu.ops import quat as rot


@struct.dataclass
class MotionLib:
    # flat frame-major arrays over all clips
    gts: jnp.ndarray      # (F, J, 3) global body translations
    grs: jnp.ndarray      # (F, J, 4) global body rotations
    lrs: jnp.ndarray      # (F, J, 4) local joint rotations
    gvs: jnp.ndarray      # (F, J, 3) global body linear velocities
    gavs: jnp.ndarray     # (F, J, 3) global body angular velocities
    dvs: jnp.ndarray      # (F, D) dof velocities

    # per-clip metadata
    length_starts: jnp.ndarray  # (M,) int32 frame offset of each clip
    lengths: jnp.ndarray        # (M,) float seconds (num_frames-1)/fps
    num_frames: jnp.ndarray     # (M,) int32
    dt: jnp.ndarray             # (M,) float 1/fps
    weights: jnp.ndarray        # (M,) normalized sampling weights

    key_body_ids: jnp.ndarray   # (K,) int32

    # static joint layout (hashable; matches reference humanoid.py:183-195)
    dof_body_ids: Tuple[int, ...] = struct.field(pytree_node=False)
    dof_offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    num_joints: int = struct.field(pytree_node=False)

    # packed per-frame feature matrix (F, Dp) — every field get_motion_state
    # needs, concatenated so the blended query is TWO row gathers instead of
    # ~11 per-field gathers (the reset path's gather soup was dispatch-bound).
    # Layout: [root_pos(3) | root_rot(4) | lrs(4J) | root_vel(3) |
    #          root_ang_vel(3) | dof_vel(D) | key_pos(3K)].
    packed: Optional[jnp.ndarray] = None
    # packed per-clip metadata (M, 4) f32: [length, num_frames, dt,
    # length_start] — one gather instead of four (counts < 2^24 are exact).
    meta: Optional[jnp.ndarray] = None

    @property
    def num_dof(self) -> int:
        return self.dof_offsets[-1]

    @property
    def num_motions(self) -> int:
        return int(self.weights.shape[0])


# ---------------------------------------------------------------------------
# jittable queries
# ---------------------------------------------------------------------------

def sample_motions(lib: MotionLib, rng: jax.Array, n: int) -> jnp.ndarray:
    """Weighted clip sampling (spec: motion_lib.py:100-106)."""
    logits = jnp.log(jnp.maximum(lib.weights, 1e-12))
    return jax.random.categorical(rng, logits, shape=(n,))


def sample_time(
    lib: MotionLib, rng: jax.Array, motion_ids: jnp.ndarray, truncate_time: float = 0.0
) -> jnp.ndarray:
    """Uniform phase over (possibly truncated) clip length (spec: 108-118)."""
    phase = jax.random.uniform(rng, motion_ids.shape)
    motion_len = lib.lengths[motion_ids] - truncate_time
    return phase * motion_len


def _calc_frame_blend(time, length, num_frames, dt):
    """Spec: motion_lib.py:263-272."""
    phase = jnp.clip(time / jnp.maximum(length, 1e-6), 0.0, 1.0)
    idx0 = (phase * (num_frames - 1).astype(phase.dtype)).astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, num_frames - 1)
    blend = (time - idx0.astype(phase.dtype) * dt) / dt
    return idx0, idx1, blend


def local_rotation_to_dof(lib: MotionLib, local_rot: jnp.ndarray) -> jnp.ndarray:
    """(…, J, 4) local rotations → (…, D) dof positions.

    3-dof joints use the exponential map of the local quaternion; 1-dof joints
    project onto the (y) hinge axis and wrap (spec: motion_lib.py:296-324).
    """
    pieces = []
    for j, body_id in enumerate(lib.dof_body_ids):
        size = lib.dof_offsets[j + 1] - lib.dof_offsets[j]
        q = local_rot[..., body_id, :]
        if size == 3:
            pieces.append(rot.quat_to_exp_map(q))
        elif size == 1:
            angle, axis = rot.quat_to_angle_axis(q)
            theta = rot.normalize_angle(angle * axis[..., 1])
            pieces.append(theta[..., None])
        else:
            raise ValueError(f"unsupported joint size {size}")
    return jnp.concatenate(pieces, axis=-1)


def get_motion_state(lib: MotionLib, motion_ids: jnp.ndarray, motion_times: jnp.ndarray):
    """Blended kinematic state at arbitrary times (spec: motion_lib.py:123-172).

    Returns dict with root_pos, root_rot, dof_pos, root_vel, root_ang_vel,
    dof_vel, key_pos — all leading shape = motion_ids.shape.

    Default path reads the packed (F, Dp) frame matrix: 2 row gathers + 1
    metadata gather per query (the per-field path's ~15 gathers were the
    dispatch-bound "reset gather soup"). ``ASE_TPU_UNPACKED_MOTION=1``
    restores the per-field path (bit-identical results; parity-tested).
    """
    if lib.packed is not None and os.environ.get(
            "ASE_TPU_UNPACKED_MOTION", "0") != "1":
        return _get_motion_state_packed(lib, motion_ids, motion_times)

    length = lib.lengths[motion_ids]
    nf = lib.num_frames[motion_ids]
    dt = lib.dt[motion_ids]

    idx0, idx1, blend = _calc_frame_blend(motion_times, length, nf, dt)
    f0 = idx0 + lib.length_starts[motion_ids]
    f1 = idx1 + lib.length_starts[motion_ids]

    b = blend[..., None]

    root_pos = (1.0 - b) * lib.gts[f0, 0] + b * lib.gts[f1, 0]
    root_rot = rot.slerp(lib.grs[f0, 0], lib.grs[f1, 0], b)

    local_rot = rot.slerp(lib.lrs[f0], lib.lrs[f1], b[..., None])
    dof_pos = local_rotation_to_dof(lib, local_rot)

    root_vel = lib.gvs[f0, 0]
    root_ang_vel = lib.gavs[f0, 0]
    dof_vel = lib.dvs[f0]

    key0 = lib.gts[f0[..., None], lib.key_body_ids]
    key1 = lib.gts[f1[..., None], lib.key_body_ids]
    key_pos = (1.0 - b[..., None]) * key0 + b[..., None] * key1

    return {
        "root_pos": root_pos,
        "root_rot": root_rot,
        "dof_pos": dof_pos,
        "root_vel": root_vel,
        "root_ang_vel": root_ang_vel,
        "dof_vel": dof_vel,
        "key_pos": key_pos,
    }


def _packed_offsets(lib: MotionLib):
    """Static column offsets into the packed frame matrix."""
    J = lib.num_joints
    D = lib.num_dof
    o_rot = 3
    o_lrs = o_rot + 4
    o_vel = o_lrs + 4 * J
    o_avel = o_vel + 3
    o_dvs = o_avel + 3
    o_key = o_dvs + D
    return o_rot, o_lrs, o_vel, o_avel, o_dvs, o_key


def _get_motion_state_packed(lib: MotionLib, motion_ids, motion_times):
    meta = lib.meta[motion_ids]                       # one (n, 4) gather
    length = meta[..., 0]
    nf = meta[..., 1].astype(jnp.int32)
    dt = meta[..., 2]
    starts = meta[..., 3].astype(jnp.int32)

    idx0, idx1, blend = _calc_frame_blend(motion_times, length, nf, dt)
    p0 = lib.packed[idx0 + starts]                    # (n, Dp)
    p1 = lib.packed[idx1 + starts]
    b = blend[..., None]

    o_rot, o_lrs, o_vel, o_avel, o_dvs, o_key = _packed_offsets(lib)
    J = lib.num_joints
    K = int(lib.key_body_ids.shape[0])
    lead = p0.shape[:-1]

    root_pos = (1.0 - b) * p0[..., :o_rot] + b * p1[..., :o_rot]
    root_rot = rot.slerp(p0[..., o_rot:o_lrs], p1[..., o_rot:o_lrs], b)

    lr0 = p0[..., o_lrs:o_vel].reshape(lead + (J, 4))
    lr1 = p1[..., o_lrs:o_vel].reshape(lead + (J, 4))
    local_rot = rot.slerp(lr0, lr1, b[..., None])
    dof_pos = local_rotation_to_dof(lib, local_rot)

    key0 = p0[..., o_key:o_key + 3 * K].reshape(lead + (K, 3))
    key1 = p1[..., o_key:o_key + 3 * K].reshape(lead + (K, 3))
    key_pos = (1.0 - b[..., None]) * key0 + b[..., None] * key1

    return {
        "root_pos": root_pos,
        "root_rot": root_rot,
        "dof_pos": dof_pos,
        "root_vel": p0[..., o_vel:o_avel],
        "root_ang_vel": p0[..., o_avel:o_dvs],
        "dof_vel": p0[..., o_dvs:o_key],
        "key_pos": key_pos,
    }


def _build_packed(gts, grs, lrs, gvs, gavs, dvs, key_body_ids,
                  lengths, num_frames, dts, starts):
    """Host-side packed frame matrix + clip metadata (see MotionLib.packed)."""
    F = gts.shape[0]
    # num_frames / length_starts round-trip through the float32 meta table:
    # exact only while every frame index fits a float32 mantissa
    assert F < 2 ** 24, (
        f"{F} total motion frames exceed float32-exact integer range (2^24); "
        "the packed meta table would silently corrupt frame indices")
    key = np.asarray(key_body_ids, dtype=np.int64)
    packed = np.concatenate([
        np.asarray(gts[:, 0], np.float32),
        np.asarray(grs[:, 0], np.float32),
        np.asarray(lrs, np.float32).reshape(F, -1),
        np.asarray(gvs[:, 0], np.float32),
        np.asarray(gavs[:, 0], np.float32),
        np.asarray(dvs, np.float32),
        np.asarray(gts[:, key], np.float32).reshape(F, -1),
    ], axis=1)
    meta = np.stack([
        np.asarray(lengths, np.float32),
        np.asarray(num_frames, np.float32),
        np.asarray(dts, np.float32),
        np.asarray(starts, np.float32),
    ], axis=1)
    return packed, meta


def get_body_state(lib: MotionLib, motion_ids: jnp.ndarray, motion_times: jnp.ndarray):
    """Full per-body kinematic state (used by view-motion playback)."""
    length = lib.lengths[motion_ids]
    nf = lib.num_frames[motion_ids]
    dt = lib.dt[motion_ids]
    idx0, idx1, blend = _calc_frame_blend(motion_times, length, nf, dt)
    f0 = idx0 + lib.length_starts[motion_ids]
    f1 = idx1 + lib.length_starts[motion_ids]
    b = blend[..., None, None]
    body_pos = (1.0 - b) * lib.gts[f0] + b * lib.gts[f1]
    body_rot = rot.slerp(lib.grs[f0], lib.grs[f1], b)
    body_vel = lib.gvs[f0]
    body_ang_vel = lib.gavs[f0]
    return body_pos, body_rot, body_vel, body_ang_vel


# ---------------------------------------------------------------------------
# loading (host side, runs once)
# ---------------------------------------------------------------------------

def _fetch_motion_files(motion_file: str):
    """Single clip or weighted .yaml dataset (spec: motion_lib.py:238-261)."""
    ext = os.path.splitext(motion_file)[1]
    if ext == ".yaml":
        dir_name = os.path.dirname(motion_file)
        with open(motion_file, "r") as f:
            cfg = yaml.safe_load(f)
        files, weights = [], []
        for entry in cfg["motions"]:
            files.append(os.path.join(dir_name, entry["file"]))
            w = float(entry["weight"])
            assert w >= 0
            weights.append(w)
        return files, weights
    return [motion_file], [1.0]


def _np_local_to_dof_vel(lr0, lr1, dt, dof_body_ids, dof_offsets, num_dof):
    """Dof velocities from consecutive local rotations, vectorized over frames
    (spec: reference motion_lib.py:326-354). lr0/lr1: (T, J, 4)."""
    diff = sk._np_quat_mul(sk._np_quat_conj(lr0), lr1)
    diff = diff / np.maximum(np.linalg.norm(diff, axis=-1, keepdims=True), 1e-12)
    angle, axis = sk._np_quat_to_angle_axis(diff)
    local_vel = axis * angle[..., None] / dt  # (T, J, 3)
    T = lr0.shape[0]
    dof_vel = np.zeros((T, num_dof), dtype=np.float32)
    for j, body_id in enumerate(dof_body_ids):
        off = dof_offsets[j]
        size = dof_offsets[j + 1] - off
        if size == 3:
            dof_vel[:, off : off + 3] = local_vel[:, body_id]
        else:
            dof_vel[:, off] = local_vel[:, body_id, 1]
    return dof_vel


def load_motion_npy(path: str):
    """Load one reference-format SkeletonMotion .npy (Serializable dict)."""
    d = np.load(path, allow_pickle=True).item()
    tree = sk.SkeletonTree.from_dict(d["skeleton_tree"])
    rotation = np.asarray(d["rotation"]["arr"], dtype=np.float32)
    root_translation = np.asarray(d["root_translation"]["arr"], dtype=np.float32)
    fps = float(d["fps"])
    is_local = bool(d.get("is_local", True))
    gv = d.get("global_velocity")
    gav = d.get("global_angular_velocity")
    gv = np.asarray(gv["arr"], dtype=np.float32) if gv is not None else None
    gav = np.asarray(gav["arr"], dtype=np.float32) if gav is not None else None
    if not is_local:
        local = np.asarray(
            jax.device_get(sk.global_to_local(tree, jnp.asarray(rotation)))
        )
        rotation = local
    return tree, rotation, root_translation, fps, gv, gav


_CACHE_FIELDS = ("gts", "grs", "lrs", "gvs", "gavs", "dvs",
                 "length_starts", "lengths", "num_frames", "dt", "weights")


def _cache_path(motion_file: str, files, weights, dof_body_ids, dof_offsets) -> str:
    import hashlib

    h = hashlib.sha1()
    for f, w in zip(files, weights):
        try:
            h.update(f"{f}:{os.path.getmtime(f)}:{w};".encode())
        except OSError:
            h.update(f"{f}:?:{w};".encode())
    h.update(repr((tuple(dof_body_ids), tuple(dof_offsets))).encode())
    base = os.path.basename(motion_file).replace(".", "_")
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "ase_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"{base}_{h.hexdigest()[:16]}.msc")


def _try_native_cache(path: str):
    """mmap a compiled dataset cache (zero-copy) via the C++ extension."""
    from ase_tpu import native as native_mod

    mc = native_mod.get_motion_cache()
    if mc is None or not os.path.exists(path):
        return None
    try:
        entries, capsule = mc.load(path)
    except Exception:
        return None
    out = {}
    for (name, dtype, shape, view) in entries:
        # copy out of the mapping: jax's CPU backend zero-copy aliases numpy
        # buffers, which would dangle once the mmap capsule is collected
        arr = np.frombuffer(view, dtype=np.dtype(dtype)).reshape(shape)
        out[name] = np.array(arr, copy=True)
    del capsule  # release the mapping
    return out


def _save_native_cache(path: str, arrays: dict) -> None:
    from ase_tpu import native as native_mod

    mc = native_mod.get_motion_cache()
    if mc is None:
        return
    names, dtypes, shapes, bufs = [], [], [], []
    for k in _CACHE_FIELDS:
        a = np.ascontiguousarray(arrays[k])
        names.append(k)
        dtypes.append(a.dtype.str)
        shapes.append(tuple(int(x) for x in a.shape))
        bufs.append(a)
    try:
        mc.pack(path, names, dtypes, shapes, bufs)
    except Exception:
        pass


def load_motion_lib(
    motion_file: str,
    dof_body_ids: Sequence[int],
    dof_offsets: Sequence[int],
    key_body_ids: Sequence[int],
    use_cache: bool = True,
) -> MotionLib:
    files, weights = _fetch_motion_files(motion_file)
    num_dof = int(dof_offsets[-1])

    if use_cache:
        cpath = _cache_path(motion_file, files, weights, dof_body_ids, dof_offsets)
        cached = _try_native_cache(cpath)
        if cached is not None:
            packed, meta = _build_packed(
                cached["gts"], cached["grs"], cached["lrs"], cached["gvs"],
                cached["gavs"], cached["dvs"], key_body_ids,
                cached["lengths"], cached["num_frames"], cached["dt"],
                cached["length_starts"])
            lib = MotionLib(
                gts=jnp.asarray(cached["gts"]), grs=jnp.asarray(cached["grs"]),
                lrs=jnp.asarray(cached["lrs"]), gvs=jnp.asarray(cached["gvs"]),
                gavs=jnp.asarray(cached["gavs"]), dvs=jnp.asarray(cached["dvs"]),
                length_starts=jnp.asarray(cached["length_starts"]),
                lengths=jnp.asarray(cached["lengths"]),
                num_frames=jnp.asarray(cached["num_frames"]),
                dt=jnp.asarray(cached["dt"]),
                weights=jnp.asarray(cached["weights"]),
                key_body_ids=jnp.asarray(np.asarray(key_body_ids, dtype=np.int32)),
                dof_body_ids=tuple(int(i) for i in dof_body_ids),
                dof_offsets=tuple(int(i) for i in dof_offsets),
                num_joints=int(cached["gts"].shape[1]),
                packed=jnp.asarray(packed), meta=jnp.asarray(meta),
            )
            return lib

    all_gts, all_grs, all_lrs, all_gvs, all_gavs, all_dvs = (
        [], [], [], [], [], [],
    )
    lengths, nframes, dts = [], [], []
    tree = None

    for path in files:
        tree, local_rot, root_t, fps, gv, gav = load_motion_npy(path)
        T = local_rot.shape[0]
        grs, gts = sk.np_fk(tree, local_rot, root_t)
        grs = np.asarray(grs, dtype=np.float32)
        gts = np.asarray(gts, dtype=np.float32)
        if gv is None or gav is None:
            gv, gav = sk.compute_velocities(gts, grs, fps)

        clip_dt = 1.0 / fps
        if T > 1:
            dvs = np.zeros((T, num_dof), dtype=np.float32)
            dvs[:-1] = _np_local_to_dof_vel(
                local_rot[:-1], local_rot[1:], clip_dt, dof_body_ids, dof_offsets, num_dof
            )
            dvs[-1] = dvs[-2]
        else:
            dvs = np.zeros((T, num_dof), dtype=np.float32)

        all_gts.append(gts)
        all_grs.append(grs)
        all_lrs.append(local_rot)
        all_gvs.append(gv)
        all_gavs.append(gav)
        all_dvs.append(dvs)
        lengths.append(clip_dt * (T - 1))
        nframes.append(T)
        dts.append(clip_dt)

    w = np.asarray(weights, dtype=np.float32)
    w = w / w.sum()
    nf = np.asarray(nframes, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(nf)[:-1]]).astype(np.int32)

    if use_cache:
        _save_native_cache(cpath, {
            "gts": np.concatenate(all_gts), "grs": np.concatenate(all_grs),
            "lrs": np.concatenate(all_lrs), "gvs": np.concatenate(all_gvs),
            "gavs": np.concatenate(all_gavs), "dvs": np.concatenate(all_dvs),
            "length_starts": starts,
            "lengths": np.asarray(lengths, dtype=np.float32),
            "num_frames": nf, "dt": np.asarray(dts, dtype=np.float32),
            "weights": w,
        })

    gts_c, grs_c, lrs_c = (np.concatenate(all_gts), np.concatenate(all_grs),
                           np.concatenate(all_lrs))
    gvs_c, gavs_c, dvs_c = (np.concatenate(all_gvs), np.concatenate(all_gavs),
                            np.concatenate(all_dvs))
    packed, meta = _build_packed(
        gts_c, grs_c, lrs_c, gvs_c, gavs_c, dvs_c, key_body_ids,
        lengths, nf, dts, starts)
    lib = MotionLib(
        gts=jnp.asarray(gts_c),
        grs=jnp.asarray(grs_c),
        lrs=jnp.asarray(lrs_c),
        gvs=jnp.asarray(gvs_c),
        gavs=jnp.asarray(gavs_c),
        dvs=jnp.asarray(dvs_c),
        length_starts=jnp.asarray(starts),
        lengths=jnp.asarray(np.asarray(lengths, dtype=np.float32)),
        num_frames=jnp.asarray(nf),
        dt=jnp.asarray(np.asarray(dts, dtype=np.float32)),
        weights=jnp.asarray(w),
        key_body_ids=jnp.asarray(np.asarray(key_body_ids, dtype=np.int32)),
        dof_body_ids=tuple(int(i) for i in dof_body_ids),
        dof_offsets=tuple(int(i) for i in dof_offsets),
        num_joints=tree.num_joints,
        packed=jnp.asarray(packed), meta=jnp.asarray(meta),
    )
    return lib
