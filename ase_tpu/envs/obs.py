"""Observation / reward / termination kernels (pure, batched, jit-fused).

Semantic re-implementations of the reference's TorchScript kernels:

* ``dof_to_obs``                       — reference humanoid.py:522-552
* ``compute_humanoid_observations_max``— reference humanoid.py:591-635
* ``build_amp_observations``           — reference humanoid_amp.py:282-316
* ``compute_humanoid_reset``           — reference humanoid.py:644-670

All functions take batched arrays (B, ...) and are shape-static; the env layer
composes them inside the jitted step so XLA fuses them with the simulator.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ase_tpu.ops import quat as rot


def dof_to_obs(pose: jnp.ndarray, dof_offsets: Sequence[int]) -> jnp.ndarray:
    """Per-joint 6D tangent-normal encoding of dof positions.

    pose: (B, D). Returns (B, 6 * num_joints).
    """
    num_joints = len(dof_offsets) - 1
    pieces = []
    for j in range(num_joints):
        off = dof_offsets[j]
        size = dof_offsets[j + 1] - off
        joint_pose = pose[..., off : off + size]
        if size == 3:
            q = rot.exp_map_to_quat(joint_pose)
        elif size == 1:
            axis = jnp.array([0.0, 1.0, 0.0])
            q = rot.quat_from_angle_axis(joint_pose[..., 0], axis)
        else:
            raise ValueError("unsupported joint size")
        pieces.append(rot.quat_to_tan_norm(q))
    return jnp.concatenate(pieces, axis=-1)


def compute_humanoid_observations_max(
    body_pos: jnp.ndarray,      # (B, nb, 3)
    body_rot: jnp.ndarray,      # (B, nb, 4)
    body_vel: jnp.ndarray,      # (B, nb, 3)
    body_ang_vel: jnp.ndarray,  # (B, nb, 3)
    local_root_obs: bool,
    root_height_obs: bool,
) -> jnp.ndarray:
    """Full-body 'max' observation (1 + nb*15 - 3 dims)."""
    root_pos = body_pos[:, 0, :]
    root_rot = body_rot[:, 0, :]

    root_h = root_pos[:, 2:3]
    heading_rot = rot.calc_heading_quat_inv(root_rot)
    root_h_obs = root_h if root_height_obs else jnp.zeros_like(root_h)

    hr = heading_rot[:, None, :]  # broadcast over bodies

    local_body_pos = body_pos - root_pos[:, None, :]
    local_body_pos = rot.quat_rotate(hr, local_body_pos)
    local_body_pos = local_body_pos.reshape(local_body_pos.shape[0], -1)[..., 3:]

    local_body_rot = rot.quat_mul(jnp.broadcast_to(hr, body_rot.shape), body_rot)
    local_body_rot_obs = rot.quat_to_tan_norm(local_body_rot)
    if local_root_obs:
        root_rot_obs = rot.quat_to_tan_norm(root_rot)
        local_body_rot_obs = local_body_rot_obs.at[:, 0, :].set(root_rot_obs)
    local_body_rot_obs = local_body_rot_obs.reshape(local_body_rot_obs.shape[0], -1)

    local_body_vel = rot.quat_rotate(hr, body_vel).reshape(body_vel.shape[0], -1)
    local_body_ang_vel = rot.quat_rotate(hr, body_ang_vel).reshape(body_ang_vel.shape[0], -1)

    return jnp.concatenate(
        [root_h_obs, local_body_pos, local_body_rot_obs, local_body_vel, local_body_ang_vel],
        axis=-1,
    )


def compute_humanoid_observations(
    root_pos, root_rot, root_vel, root_ang_vel, dof_pos, dof_vel, key_body_pos,
    local_root_obs: bool, root_height_obs: bool, dof_offsets,
) -> jnp.ndarray:
    """Reduced observation (reference humanoid.py:554-589); shares the AMP layout."""
    return build_amp_observations(
        root_pos, root_rot, root_vel, root_ang_vel, dof_pos, dof_vel, key_body_pos,
        local_root_obs, root_height_obs, dof_offsets,
    )


def build_amp_observations(
    root_pos: jnp.ndarray,      # (B, 3)
    root_rot: jnp.ndarray,      # (B, 4)
    root_vel: jnp.ndarray,      # (B, 3)
    root_ang_vel: jnp.ndarray,  # (B, 3)
    dof_pos: jnp.ndarray,       # (B, D)
    dof_vel: jnp.ndarray,       # (B, D)
    key_body_pos: jnp.ndarray,  # (B, K, 3)
    local_root_obs: bool,
    root_height_obs: bool,
    dof_offsets,
) -> jnp.ndarray:
    root_h = root_pos[:, 2:3]
    heading_rot = rot.calc_heading_quat_inv(root_rot)

    root_rot_obs = rot.quat_mul(heading_rot, root_rot) if local_root_obs else root_rot
    root_rot_obs = rot.quat_to_tan_norm(root_rot_obs)
    root_h_obs = root_h if root_height_obs else jnp.zeros_like(root_h)

    local_root_vel = rot.quat_rotate(heading_rot, root_vel)
    local_root_ang_vel = rot.quat_rotate(heading_rot, root_ang_vel)

    local_key = key_body_pos - root_pos[:, None, :]
    local_key = rot.quat_rotate(heading_rot[:, None, :], local_key)
    flat_key = local_key.reshape(local_key.shape[0], -1)

    dof_obs = dof_to_obs(dof_pos, dof_offsets)
    return jnp.concatenate(
        [root_h_obs, root_rot_obs, local_root_vel, local_root_ang_vel, dof_obs, dof_vel, flat_key],
        axis=-1,
    )


def compute_humanoid_reset(
    progress: jnp.ndarray,          # (B,) int
    contact_forces: jnp.ndarray,    # (B, nb, 3)
    contact_body_ids: jnp.ndarray,  # (C,)
    body_pos: jnp.ndarray,          # (B, nb, 3)
    max_episode_length: float,
    enable_early_termination: bool,
    termination_heights: jnp.ndarray,  # (nb,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (reset, terminated) int32 arrays."""
    B, nb = body_pos.shape[0], body_pos.shape[1]
    terminated = jnp.zeros(B, dtype=jnp.int32)
    if enable_early_termination:
        contact_mask = jnp.ones((nb,), bool).at[contact_body_ids].set(False)
        masked_forces = contact_forces[:, :nb] * contact_mask[None, :, None]
        fall_contact = jnp.any(jnp.abs(masked_forces) > 0.1, axis=(-2, -1))

        body_height = body_pos[..., 2]
        fall_height = body_height < termination_heights[None, :]
        fall_height = fall_height & contact_mask[None, :]
        fall_height = jnp.any(fall_height, axis=-1)

        has_fallen = fall_contact & fall_height & (progress > 1)
        terminated = has_fallen.astype(jnp.int32)

    reset = jnp.where(progress >= max_episode_length - 1, 1, terminated)
    return reset.astype(jnp.int32), terminated
