"""Humanoid environment: functional, batched, fully on-device.

Capability-parity with reference ``ase/env/tasks/humanoid.py`` (+ the
BaseTask sim lifecycle it inherits, ``base_task.py``): asset load, PD action
mapping, full-body max observations, contact/height early termination — but as
a *pure-function* env over pytree state, so `reset`/`step` compose into a
jitted rollout `lax.scan` with no host round trips. Partial resets are masked
state merges (the JAX-native analog of the reference's
``reset(env_ids)`` indexed writes, ``humanoid.py:125-168``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ase_tpu.envs import obs as obs_kernels
from ase_tpu.envs.domain_rand import DomainRandomizer
from ase_tpu.ops import quat as rot
from ase_tpu.physics import collision2, dynamics, dynamics2, engine, mjcf
from ase_tpu.physics import model as M


@struct.dataclass
class EnvState:
    """Batched environment state (the analog of the reference task buffers)."""

    phys: dynamics.State                 # batched physics state
    body_pos: jnp.ndarray                # (B, nb, 3)
    body_quat: jnp.ndarray               # (B, nb, 4)
    body_vel: jnp.ndarray                # (B, nb, 3)
    body_ang_vel: jnp.ndarray            # (B, nb, 3)
    contact_forces: jnp.ndarray          # (B, nb+np, 3)
    obs: jnp.ndarray                     # (B, obs_dim)
    rew: jnp.ndarray                     # (B,)
    reset_buf: jnp.ndarray               # (B,) int32
    terminate_buf: jnp.ndarray           # (B,) int32
    progress: jnp.ndarray                # (B,) int32
    actions: jnp.ndarray                 # (B, nd) last actions
    rng: jnp.ndarray                     # scalar PRNG key
    aux: Dict[str, Any]                  # task/AMP extensions (pytree dict)


class Humanoid:
    """Config-driven humanoid env. Methods are pure: state in, state out."""

    def __init__(self, cfg: Dict[str, Any], headless: bool = True):
        self.cfg = cfg
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.max_episode_length = int(env_cfg["episodeLength"])
        self._pd_control = bool(env_cfg.get("pdControl", True))
        # Isaac dof-force / force-sensor tensor parity: when enabled, each
        # step publishes the applied dof torques in aux["dof_forces"]
        # (reference humanoid.py enable_actor_dof_force_sensors path).
        self._expose_dof_forces = bool(env_cfg.get("exposeDofForces", False))
        self.power_scale = float(env_cfg.get("powerScale", 1.0))
        self.control_freq_inv = int(env_cfg.get("controlFrequencyInv", 2))
        self._local_root_obs = bool(env_cfg["localRootObs"])
        self._root_height_obs = bool(env_cfg.get("rootHeightObs", True))
        self._enable_early_termination = bool(env_cfg["enableEarlyTermination"])
        self._termination_height = float(env_cfg.get("terminationHeight", 0.15))

        asset_root = env_cfg["asset"]["assetRoot"]
        self.asset_file = env_cfg["asset"]["assetFileName"]
        asset_path = mjcf.find_asset(asset_root, self.asset_file)
        self.model = self._build_model(asset_path)

        sim = cfg.get("sim", {})
        self.sim_dt = float(sim.get("dt", 1.0 / 60.0))
        self.dt = self.control_freq_inv * self.sim_dt
        physx = sim.get("physx", {})
        self.sim_cfg = engine.SimConfig(
            dt=self.sim_dt,
            substeps=int(sim.get("substeps", 2)),
            solver=engine.solver.SolverConfig(
                # ASE_TPU_SOLVER_ITERS: perf A/B override of the block-Jacobi
                # iteration count (the matvec chain is dispatch-bound, so
                # iterations are the cost knob; default 4x the cfg's PhysX
                # position iterations, 16 == 24 on standing accuracy)
                iterations=int(os.environ.get(
                    "ASE_TPU_SOLVER_ITERS",
                    env_cfg.get(
                        "solverIterations",
                        4 * int(physx.get("num_position_iterations", 4)),
                    ),
                )),
                scheme=str(env_cfg.get("solverScheme", "jacobi")),
                max_depenetration_velocity=float(
                    physx.get("max_depenetration_velocity", 10.0)
                ),
                contact_offset=float(physx.get("contact_offset", 0.02)),
            ),
            # ASE_TPU_MAX_CONTACTS: perf A/B override of the contact budget
            # (K scales the Delassus/Jacobi system: 3K x 3K per env)
            max_contacts=int(os.environ.get(
                "ASE_TPU_MAX_CONTACTS", env_cfg.get("maxContacts", 24))),
            enable_self_collision=bool(env_cfg.get("enableSelfCollision", True)),
            torque_control=not self._pd_control,
            power_scale=self.power_scale,
        )
        plane = env_cfg.get("plane", {})
        self.model = self.model.replace(
            plane_friction=jnp.asarray(
                float(plane.get("staticFriction", 1.0)), dtype=jnp.float32
            )
        )
        self._plane_restitution = float(plane.get("restitution", 0.0))

        self._tables = collision2.build_tables(
            self.model, self.sim_cfg.enable_self_collision
        )

        key_bodies = env_cfg["keyBodies"]
        contact_bodies = env_cfg["contactBodies"]
        self._key_body_ids = jnp.asarray(
            [self.model.body_index(b) for b in key_bodies], dtype=jnp.int32
        )
        self._contact_body_ids = jnp.asarray(
            [self.model.body_index(b) for b in contact_bodies], dtype=jnp.int32
        )

        self._build_pd_action_offset_scale()
        self._build_termination_heights()

        # chunked partial resets: reset work runs on `resetChunk`-sized
        # gathered sub-batches (gather -> reset -> scatter); bursts larger
        # than the chunk drain via repeated passes within the same step
        # (see reset_done). 0 = full-batch masked resets.
        self.reset_chunk = int(env_cfg.get("resetChunk", 0))

        # domain randomization (reference base_task.py:204-398; --randomize)
        self._randomize = bool(cfg.get("task", {}).get("randomize", False))
        self._dr = DomainRandomizer(
            cfg.get("task", {}).get("randomization_params") if self._randomize else None,
            # external correlated-sample generator, injected programmatically
            # like the reference's actor_params_generator (base_task.py:320)
            generator=cfg.get("task", {}).get("actor_params_generator"),
        )

        self._initial_root_pos = jnp.array([0.0, 0.0, 0.89])
        self._initial_root_quat = rot.quat_identity(())

        self.headless = headless

    # -- static sizes (reference get_obs_size/get_action_size) ---------------

    def _build_model(self, asset_path: str) -> M.Model:
        return mjcf.load_mjcf(asset_path)

    def get_obs_size(self) -> int:
        return 1 + self.model.nb * (3 + 6 + 3 + 3) - 3

    def get_action_size(self) -> int:
        return self.model.nd

    @property
    def num_obs(self) -> int:
        return self.get_obs_size()

    @property
    def num_actions(self) -> int:
        return self.get_action_size()

    # -- construction helpers ------------------------------------------------

    def _build_pd_action_offset_scale(self):
        """Reference humanoid.py:314-359 semantics."""
        model = self.model
        lim_low = np.asarray(model.dof_limit_lo).copy()
        lim_high = np.asarray(model.dof_limit_hi).copy()
        offsets = model.dof_offsets
        for j in range(len(offsets) - 1):
            off = offsets[j]
            size = offsets[j + 1] - off
            if size == 3:
                scale = max(
                    np.max(np.abs(lim_low[off : off + 3])),
                    np.max(np.abs(lim_high[off : off + 3])),
                )
                scale = min(1.2 * scale, np.pi)
                lim_low[off : off + 3] = -scale
                lim_high[off : off + 3] = scale
            else:
                mid = 0.5 * (lim_high[off] + lim_low[off])
                scale = 0.7 * (lim_high[off] - lim_low[off])
                lim_low[off] = mid - scale
                lim_high[off] = mid + scale
        self._pd_action_offset = jnp.asarray(0.5 * (lim_high + lim_low), dtype=jnp.float32)
        self._pd_action_scale = jnp.asarray(0.5 * (lim_high - lim_low), dtype=jnp.float32)

    def _build_termination_heights(self):
        """Reference humanoid.py:203-219."""
        heights = np.full(self.model.nb, self._termination_height, dtype=np.float32)
        head_id = self.model.body_index("head")
        heights[head_id] = max(0.3, heights[head_id])
        if "sword_shield" in self.asset_file:
            left_arm = self.model.body_index("left_lower_arm")
            heights[left_arm] = max(0.32, heights[left_arm])
        self._termination_heights = jnp.asarray(heights)

    # -- default / initial states -------------------------------------------

    def default_phys_state(self, batch: int) -> dynamics.State:
        one = dynamics.default_state(self.model)
        one = one._replace(root_pos=self._initial_root_pos, root_quat=self._initial_root_quat)
        return jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), one
        )

    def initial_state(self, rng: jnp.ndarray) -> EnvState:
        """Construct + fully reset the batched env state (jitted once)."""
        if not hasattr(self, "_initial_state_jit"):
            self._initial_state_jit = jax.jit(self._initial_state_impl)
        return self._initial_state_jit(rng)

    def _initial_state_impl(self, rng: jnp.ndarray) -> EnvState:
        B = self.num_envs
        phys = self.default_phys_state(B)
        state = EnvState(
            phys=phys,
            body_pos=jnp.zeros((B, self.model.nb, 3)),
            body_quat=jnp.tile(rot.quat_identity(())[None, None], (B, self.model.nb, 1)),
            body_vel=jnp.zeros((B, self.model.nb, 3)),
            body_ang_vel=jnp.zeros((B, self.model.nb, 3)),
            contact_forces=jnp.zeros((B, self.model.nb + self.model.num_props, 3)),
            obs=jnp.zeros((B, self.get_obs_size())),
            rew=jnp.zeros(B),
            reset_buf=jnp.zeros(B, jnp.int32),
            terminate_buf=jnp.zeros(B, jnp.int32),
            progress=jnp.zeros(B, jnp.int32),
            actions=jnp.zeros((B, self.get_action_size())),
            rng=rng,
            aux=self._initial_aux(B),
        )
        state = self._refresh_kinematics(state)
        # apply the task's reset pipeline to every env (reference BaseTask
        # construction ends with a full reset(), base_task.py:94-99)
        state = self._reset_envs(state, jnp.ones(B, bool))
        return state

    def _initial_aux(self, B: int) -> Dict[str, Any]:
        aux: Dict[str, Any] = {}
        if self._expose_dof_forces:
            aux["dof_forces"] = jnp.zeros((B, self.model.nd))
        if self._dr.enabled:
            # reference-granularity knobs: per-rigid-body mass, per-shape
            # friction, per-dof PD gains (base_task.py:332-386 samples each
            # element independently)
            aux["dr"] = self._dr.init_scales(
                B, base_restitution=self._plane_restitution,
                num_bodies=self.model.nb,
                num_shapes=self.model.nb + self.model.num_props,
                num_dofs=self.model.nd)
        return aux

    def _actor_scale(self, state: EnvState):
        """Per-env geometric scale from the DR state, or None when the scale
        knob is off (keeps the default path's FK free of extra multiplies)."""
        if self._dr.enabled and self._dr.scale_spec:
            return state.aux["dr"]["actor_scale"]
        return None

    # -- kinematic refresh (the analog of refresh_*_tensor views) ------------

    def _refresh_kinematics(self, state: EnvState) -> EnvState:
        kin = dynamics2.fk_batched(
            self.model, state.phys, actor_scale=self._actor_scale(state))
        return state.replace(
            body_pos=kin.body_pos,
            body_quat=kin.body_quat,
            body_vel=kin.body_vel[..., 3:6],
            body_ang_vel=kin.body_vel[..., 0:3],
        )

    # -- resets ---------------------------------------------------------------

    def reset_done(self, state: EnvState) -> EnvState:
        """Partial reset of all envs whose reset_buf is set (masked merge).

        With `resetChunk` set, reset work (motion-library gathers, candidate
        state construction, AMP history init) runs on a fixed-size gathered
        sub-batch instead of all envs — a large rollout speedup since only a
        handful of envs reset on a typical step. When more than one chunk of
        envs is flagged at once (a reset storm: e.g. Strike's contact-failure
        termination early in HLC training kills most of the batch in a few
        steps), a drain loop repeats chunk passes until the queue is empty —
        the reference resets ALL done envs in the same step
        (humanoid.py reset_idx on the full done set), and envs left flagged
        across steps would re-log a 1-step game and cut value bootstrapping
        every step while waiting."""
        chunk = self.reset_chunk
        if chunk and chunk < self.num_envs:
            # first pass unconditional (the common case: #flagged <= chunk;
            # keeping it outside the drain loop lets XLA overlap it with the
            # surrounding rollout step as before)
            state = self._reset_chunk_pass(state, chunk)
            # drain loop for the storm case only — body never executes when
            # one pass cleared the queue, so the steady-state cost is a
            # single cheap any() reduce on the flags
            # (ASE_TPU_RESET_DRAIN=0 restores the old spill-to-later-steps
            # behavior as a perf A/B oracle)
            if os.environ.get("ASE_TPU_RESET_DRAIN", "1") == "1":
                state = jax.lax.while_loop(
                    lambda s: jnp.any(s.reset_buf > 0),
                    lambda s: self._reset_chunk_pass(s, chunk),
                    state,
                )
            return state
        mask = state.reset_buf > 0
        return self._reset_envs(state, mask)

    def _reset_chunk_pass(self, state: EnvState, chunk: int) -> EnvState:
        """One fixed-size chunked reset pass over the first `chunk` flagged
        envs (by env index).

        Compacts the flagged env ids into the chunk with a cumsum rank (a
        full-width argsort cost ~0.7 ms/step at 4096 envs; the
        scatter-compaction is a fused elementwise+scatter). Unfilled slots
        alias env 0, whose reset_buf==0 rows pass through _reset_envs'
        masked merges unchanged."""
        flag = state.reset_buf > 0
        rank = jnp.cumsum(flag) - 1
        pos = jnp.where(flag, rank, chunk)
        idx = (jnp.zeros(chunk, jnp.int32)
               .at[pos].set(jnp.arange(self.num_envs, dtype=jnp.int32),
                            mode="drop"))
        # slots beyond the number of flagged envs alias env 0 (the
        # scatter default): never reset them and drop their write-back,
        # or a genuinely-resetting env 0 would race its own duplicates
        valid = jnp.arange(chunk) < jnp.minimum(jnp.sum(flag), chunk)
        sub, pack = self._gather_env_state(state, idx, return_pack=True)
        sub = self._reset_envs(sub, (sub.reset_buf > 0) & valid)
        return self._scatter_env_state(
            state, sub, jnp.where(valid, idx, self.num_envs), pack=pack)

    # Per-leaf gather/scatter dispatches ~60 kernels per rollout step (~30
    # EnvState leaves x 2) — measured 3.3 ms/step at 4096 envs, dispatch-
    # bound, dwarfing the actual reset compute. The packed path concatenates
    # every float (B, ...) leaf into ONE (B, D) matrix so the gather and the
    # scatter are one kernel each; integer/bool leaves (a handful) stay
    # per-leaf. ASE_TPU_PACKED_RESET=0 restores the per-leaf path.

    def _leaf_split(self, leaves):
        """Indices of packable float leaves vs other per-env leaves."""
        B = self.num_envs
        f_idx, o_idx = [], []
        for i, x in enumerate(leaves):
            if not (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B):
                continue
            if x.size == 0:
                continue  # zero-sized leaves pass through (no device kernel)
            if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype == jnp.float32:
                f_idx.append(i)
            else:
                o_idx.append(i)
        return f_idx, o_idx

    def _gather_env_state(self, state: EnvState, idx: jnp.ndarray,
                          return_pack: bool = False):
        rng = state.rng
        B = self.num_envs
        state0 = state.replace(rng=jnp.zeros(()))

        if os.environ.get("ASE_TPU_PACKED_RESET", "1") != "1":
            def g(x):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B:
                    return x[idx]
                return x

            sub = jax.tree_util.tree_map(g, state0).replace(rng=rng)
            return (sub, None) if return_pack else sub

        leaves, treedef = jax.tree_util.tree_flatten(state0)
        f_idx, o_idx = self._leaf_split(leaves)
        X = jnp.concatenate([leaves[i].reshape(B, -1) for i in f_idx], axis=1)
        sub_X = X[idx]
        out = list(leaves)
        off = 0
        for i in f_idx:
            n = int(np.prod(leaves[i].shape[1:], dtype=np.int64)) if leaves[i].ndim > 1 else 1
            out[i] = sub_X[:, off:off + n].reshape((idx.shape[0],) + leaves[i].shape[1:])
            off += n
        for i in o_idx:
            out[i] = leaves[i][idx]
        # zero-sized per-env leaves are skipped by _leaf_split (their gather
        # kernels cost pure dispatch); keep the chunk's batch dim consistent
        # with free constants instead
        for i, x in enumerate(leaves):
            if (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B
                    and x.size == 0):
                out[i] = jnp.zeros((idx.shape[0],) + x.shape[1:], x.dtype)
        sub = jax.tree_util.tree_unflatten(treedef, out).replace(rng=rng)
        # hand the packed full-size matrix to the paired scatter so the
        # (B, D) concat of every float leaf is built once per reset, not twice
        return (sub, X) if return_pack else sub

    def _scatter_env_state(self, state: EnvState, sub: EnvState, idx: jnp.ndarray,
                           pack: jnp.ndarray = None) -> EnvState:
        rng = sub.rng
        B = self.num_envs
        state0 = state.replace(rng=jnp.zeros(()))
        sub0 = sub.replace(rng=jnp.zeros(()))

        if os.environ.get("ASE_TPU_PACKED_RESET", "1") != "1":
            def s(x, y):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B:
                    return x.at[idx].set(y)
                return x

            return jax.tree_util.tree_map(s, state0, sub0).replace(rng=rng)

        leaves, treedef = jax.tree_util.tree_flatten(state0)
        sub_leaves = jax.tree_util.tree_flatten(sub0)[0]
        f_idx, o_idx = self._leaf_split(leaves)
        C = idx.shape[0]
        X = pack if pack is not None else jnp.concatenate(
            [leaves[i].reshape(B, -1) for i in f_idx], axis=1)
        sub_X = jnp.concatenate([sub_leaves[i].reshape(C, -1) for i in f_idx], axis=1)
        X_new = X.at[idx].set(sub_X)  # out-of-range (dropped) slots skipped
        out = list(leaves)
        off = 0
        for i in f_idx:
            n = int(np.prod(leaves[i].shape[1:], dtype=np.int64)) if leaves[i].ndim > 1 else 1
            out[i] = X_new[:, off:off + n].reshape(leaves[i].shape)
            off += n
        for i in o_idx:
            out[i] = leaves[i].at[idx].set(sub_leaves[i])
        return jax.tree_util.tree_unflatten(treedef, out).replace(rng=rng)

    def _reset_envs(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        if self._dr.enabled:
            state, keys = self.split_rng(state, 1)
            aux = dict(state.aux)
            aux["dr"] = self._dr.resample_scales(keys[0], aux["dr"], mask)
            state = state.replace(aux=aux)
        new_state, mask = self._reset_actors(state, mask)
        state = _masked_merge_phys(state, new_state, mask)
        state = state.replace(
            progress=jnp.where(mask, 0, state.progress),
            reset_buf=jnp.where(mask, 0, state.reset_buf),
            terminate_buf=jnp.where(mask, 0, state.terminate_buf),
        )
        state = self._refresh_kinematics(state)
        state = self._post_reset(state, mask)
        return state

    def _reset_actors(self, state: EnvState, mask) -> Tuple[EnvState, jnp.ndarray]:
        """Produce candidate reset states for every env (selected by mask)."""
        B = mask.shape[0]
        phys = self.default_phys_state(B)
        return state.replace(phys=phys), mask

    def _post_reset(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        obs = self._compute_observations(state)
        return state.replace(obs=jnp.where(mask[:, None], obs, state.obs))

    # -- stepping -------------------------------------------------------------

    def pre_physics_step(self, state: EnvState, actions: jnp.ndarray) -> Tuple[EnvState, jnp.ndarray]:
        if self._pd_control:
            tgt = self._pd_action_offset[None] + self._pd_action_scale[None] * actions
        else:
            tgt = actions
        return state.replace(actions=actions), tgt

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        actions = jnp.clip(actions, -1.0, 1.0)
        if self._dr.enabled:
            aux = dict(state.aux)
            aux["dr"] = self._dr.tick(aux["dr"])
            state = state.replace(aux=aux)
            state, keys = self.split_rng(state, 1)
            actions = self._dr.randomize_actions(
                keys[0], actions, state.aux["dr"]["step_count"]
            )
        state, tgt = self.pre_physics_step(state, actions)

        phys = state.phys
        forces = state.contact_forces
        if self._dr.enabled:
            dr = state.aux["dr"]
            fs, gs = dr["friction_scale"], dr["stiffness_scale"]
            ms, grav = dr["mass_scale"], dr["gravity_scale"]
            ds = dr["damping_scale"] if self._dr.damping_spec else None
            rest = dr["restitution"] if self._dr.restitution_spec else None
            ascale = dr["actor_scale"] if self._dr.scale_spec else None
        else:
            fs = jnp.ones(self.num_envs)
            gs = jnp.ones(self.num_envs)
            ms = grav = ds = rest = ascale = None
        kin0 = None
        for _ in range(self.control_freq_inv):
            out = engine.step_batched(
                self.model, self.sim_cfg, self._tables, phys, tgt, fs, gs,
                mass_scale=ms, gravity_scale=grav, damping_scale=ds,
                restitution=rest, actor_scale=ascale, kin0=kin0,
            )
            phys = out.state
            kin0 = out.kin  # reuse this tick's final FK as the next tick's
        state = state.replace(
            phys=phys,
            body_pos=out.body_pos,
            body_quat=out.body_quat,
            body_vel=out.body_vel,
            body_ang_vel=out.body_ang_vel,
            contact_forces=out.contact_forces,
        )
        if self._expose_dof_forces:
            aux = dict(state.aux)
            aux["dof_forces"] = out.dof_forces
            state = state.replace(aux=aux)
        state = self.post_physics_step(state)
        return state

    def post_physics_step(self, state: EnvState) -> EnvState:
        state = state.replace(progress=state.progress + 1)
        state = self._update_aux(state)
        obs = self._compute_observations(state)
        if self._dr.enabled:
            state, keys = self.split_rng(state, 1)
            obs = self._dr.randomize_observations(
                keys[0], obs, state.aux["dr"]["step_count"]
            )
        rew = self._compute_reward(state)
        reset, term = self._compute_reset(state)
        return state.replace(obs=obs, rew=rew, reset_buf=reset, terminate_buf=term)

    def _update_aux(self, state: EnvState) -> EnvState:
        return state

    # -- obs/reward/reset ------------------------------------------------------

    def _compute_humanoid_obs(self, state: EnvState) -> jnp.ndarray:
        return obs_kernels.compute_humanoid_observations_max(
            state.body_pos, state.body_quat, state.body_vel, state.body_ang_vel,
            self._local_root_obs, self._root_height_obs,
        )

    def _compute_observations(self, state: EnvState) -> jnp.ndarray:
        return self._compute_humanoid_obs(state)

    def _compute_reward(self, state: EnvState) -> jnp.ndarray:
        return jnp.ones(self.num_envs)

    def _compute_reset(self, state: EnvState) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return obs_kernels.compute_humanoid_reset(
            state.progress,
            state.contact_forces[:, : self.model.nb],
            self._contact_body_ids,
            state.body_pos,
            float(self.max_episode_length),
            self._enable_early_termination,
            self._termination_heights,
        )

    # -- misc -----------------------------------------------------------------

    def amp_obs_size(self) -> int:
        return 0

    def split_rng(self, state: EnvState, n: int = 1):
        keys = jax.random.split(state.rng, n + 1)
        return state.replace(rng=keys[0]), keys[1:]


def _masked_merge_phys(state: EnvState, new_state: EnvState, mask: jnp.ndarray) -> EnvState:
    """Merge physics state of new_state into state where mask is set.

    Everything else (rng, aux, …) is carried from ``new_state``: the reset
    pipeline advances the PRNG and writes reset bookkeeping (reset_ref_mask,
    recovery counters, DR scales) into the candidate state, and subclass
    ``_reset_actors`` implementations mask within ``aux`` themselves. Keeping
    the pre-reset rng/aux here would freeze the env RNG and drop all reset
    bookkeeping (the round-1 RSI-diversity bug).
    """

    def merge(a, b):
        if hasattr(a, "size") and a.size == 0:
            # zero-sized leaves (e.g. prop state with num_props == 0) still
            # dispatch a ~20 us device kernel per select; skip them (trace:
            # ~14 ms/epoch of empty-array copies at 4096 envs)
            return a
        m = mask.reshape(mask.shape + (1,) * (a.ndim - 1))
        return jnp.where(m, b, a)

    merged = jax.tree_util.tree_map(merge, state.phys, new_state.phys)
    return new_state.replace(phys=merged)
