"""HumanoidPerturb: projectile robustness benchmark.

Capability-parity with reference ``ase/env/tasks/humanoid_perturb.py``: 13
scripted box projectiles per env (12 small 0.2³ @ density 200, 1 large 0.5³ @
density 100), launched at the character's torso on a fixed timestep schedule
with randomized origin/speed, early termination disabled
(``humanoid_perturb.py:12-26, 150-213, 237-245``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.envs.humanoid import EnvState
from ase_tpu.envs.humanoid_amp import HumanoidAMP
from ase_tpu.ops import quat as rot
from ase_tpu.physics import mjcf

# (size_class, gap_steps) schedule — reference PERTURB_OBJS table
PERTURB_OBJS = [
    ("small", 60), ("small", 7), ("small", 10), ("small", 35), ("small", 2),
    ("small", 2), ("small", 3), ("small", 2), ("small", 2), ("small", 3),
    ("small", 2), ("large", 60), ("small", 300),
]


class HumanoidPerturb(HumanoidAMP):
    def __init__(self, cfg, headless: bool = True):
        super().__init__(cfg, headless=headless)
        self._proj_dist_min = 4.0
        self._proj_dist_max = 5.0
        self._proj_h_min = 0.25
        self._proj_h_max = 2.0
        self._proj_speed_min = 30.0
        self._proj_speed_max = 40.0
        # cumulative launch times (reference _calc_perturb_times)
        times = np.cumsum([gap for _, gap in PERTURB_OBJS])
        self._perturb_timesteps = jnp.asarray(times, dtype=jnp.int32)
        self._perturb_period = int(times[-1]) + 1

    def _build_model(self, asset_path: str):
        model = mjcf.load_mjcf(asset_path)
        props = []
        for kind, _ in PERTURB_OBJS:
            if kind == "small":
                props.append(mjcf.box_prop([0.1, 0.1, 0.1], density=200.0))
            else:
                props.append(mjcf.box_prop([0.25, 0.25, 0.25], density=100.0))
        return mjcf.add_props(model, props)

    def _initial_aux(self, B: int) -> Dict[str, Any]:
        aux = super()._initial_aux(B)
        return aux

    def default_phys_state(self, batch):
        phys = super().default_phys_state(batch)
        # park projectiles far away (reference default pose x=200+i)
        park = jnp.stack(
            [jnp.array([200.0 + i, 0.0, 1.0]) for i in range(len(PERTURB_OBJS))]
        )
        prop_pos = jnp.tile(park[None], (batch, 1, 1))
        return phys._replace(prop_pos=prop_pos)

    def post_physics_step(self, state: EnvState) -> EnvState:
        state = self._update_proj(state)
        return super().post_physics_step(state)

    def _update_proj(self, state: EnvState) -> EnvState:
        """Launch the scheduled projectile (if any) at the torso."""
        B = self.num_envs
        state, keys = self.split_rng(state, 4)
        curr = jnp.remainder(state.progress, self._perturb_period)  # (B,) schedule
        # which projectile (if any) launches this step, per env
        launch_matrix = curr[:, None] == self._perturb_timesteps[None, :]  # (B, P)

        humanoid_root = state.body_pos[:, 0, :]
        theta = 2 * jnp.pi * jax.random.uniform(keys[0], (B,))
        dist = (self._proj_dist_max - self._proj_dist_min) * jax.random.uniform(
            keys[1], (B,)
        ) + self._proj_dist_min
        pos = jnp.stack(
            [
                humanoid_root[:, 0] + dist * jnp.cos(theta),
                humanoid_root[:, 1] - dist * jnp.sin(theta),
                (self._proj_h_max - self._proj_h_min) * jax.random.uniform(keys[2], (B,))
                + self._proj_h_min,
            ],
            axis=-1,
        )
        tar_body_idx = 1  # torso (reference hardcodes 1)
        tar_pos = state.body_pos[:, tar_body_idx, :]
        k3a, k3b = jax.random.split(keys[3])
        launch_dir = tar_pos - pos + 0.1 * jax.random.normal(k3a, (B, 3))
        launch_dir = launch_dir / jnp.maximum(
            jnp.linalg.norm(launch_dir, axis=-1, keepdims=True), 1e-8
        )
        speed = (self._proj_speed_max - self._proj_speed_min) * jax.random.uniform(
            k3b, (B, 1)
        ) + self._proj_speed_min
        vel = speed * launch_dir
        vel = vel.at[:, 0:2].add(state.body_vel[:, tar_body_idx, 0:2])

        phys = state.phys
        prop_pos, prop_quat, u = phys.prop_pos, phys.prop_quat, phys.u
        for p in range(len(PERTURB_OBJS)):
            m = launch_matrix[:, p]
            prop_pos = prop_pos.at[:, p].set(
                jnp.where(m[:, None], pos, prop_pos[:, p])
            )
            prop_quat = prop_quat.at[:, p].set(
                jnp.where(m[:, None], rot.quat_identity((B,)), prop_quat[:, p])
            )
            off = self.model.nu + 6 * p
            blk = jnp.concatenate([vel, jnp.zeros((B, 3))], axis=-1)
            u = u.at[:, off : off + 6].set(
                jnp.where(m[:, None], blk, u[:, off : off + 6])
            )
        return state.replace(
            phys=phys._replace(prop_pos=prop_pos, prop_quat=prop_quat, u=u)
        )

    def _compute_reset(self, state: EnvState):
        """Termination disabled (reference humanoid_perturb.py:237-245)."""
        reset = (state.progress >= self.max_episode_length - 1).astype(jnp.int32)
        return reset, jnp.zeros_like(reset)
