"""Domain randomization engine (reference ``ase/env/tasks/base_task.py:204-398``).

Capability surface reproduced the JAX way:

* scheduled (constant / linear ramp) gaussian or uniform noise on observations
  and actions, with additive or scaling operations;
* per-env physics property scales (friction, mass, PD gains) resampled every
  ``frequency`` episodes and applied inside the jitted step;
* everything lives in env aux state — no host-side property setters.

Config schema matches the reference's ``task.randomization_params`` block:
  randomization_params:
    frequency: 600
    observations: {range: [0, .002], operation: additive, distribution: gaussian}
    actions:      {range: [0., .02], operation: additive, distribution: gaussian}
    actor_params: {humanoid: {rigid_body_properties: {mass: {range: [0.9,1.1], ...}}}}
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def _sched_scale(schedule: Optional[str], schedule_steps: int, step_count) -> jnp.ndarray:
    if schedule == "linear":
        return jnp.minimum(step_count / float(max(schedule_steps, 1)), 1.0)
    return jnp.asarray(1.0)


class NoiseSpec:
    def __init__(self, cfg: Dict[str, Any]):
        self.lo, self.hi = [float(x) for x in cfg.get("range", [0.0, 0.0])]
        self.operation = cfg.get("operation", "additive")
        self.distribution = cfg.get("distribution", "gaussian")
        self.schedule = cfg.get("schedule", None)
        self.schedule_steps = int(cfg.get("schedule_steps", 1))
        # setup-vs-runtime: a setup_only property is randomized once per env
        # at creation and never resampled (reference base_task.py:306-330
        # distinguishes properties applied at sim setup from per-episode
        # rerandomization on the `frequency` schedule)
        self.setup_only = bool(cfg.get("setup_only", False))

    def apply(self, rng, x, step_count):
        s = _sched_scale(self.schedule, self.schedule_steps, step_count)
        if self.distribution == "gaussian":
            mu, sigma = self.lo, self.hi * s
            noise = mu + sigma * jax.random.normal(rng, x.shape)
        else:
            lo = self.lo * s if self.operation == "additive" else 1.0 + (self.lo - 1.0) * s
            hi = self.hi * s if self.operation == "additive" else 1.0 + (self.hi - 1.0) * s
            noise = jax.random.uniform(rng, x.shape, minval=lo, maxval=hi)
        if self.operation == "scaling":
            return x * noise
        return x + noise


class DomainRandomizer:
    """Holds the parsed spec; apply_* methods are pure/jit-safe.

    ``generator`` is the analog of the reference's external
    ``actor_params_generator`` (reference base_task.py:320-330,388-396): a
    callable ``(rng, B) -> {scale_name: (B,) array}`` that produces property
    samples from an arbitrary (e.g. full-covariance, correlated) distribution
    instead of the per-property independent specs. Returned keys override the
    independently sampled scales on every due resample; it must be jit-safe
    (pure function of the rng key).
    """

    def __init__(self, cfg: Optional[Dict[str, Any]], generator=None):
        cfg = cfg or {}
        self.enabled = bool(cfg)
        self.generator = generator
        self.frequency = int(cfg.get("frequency", 600))
        self.obs_spec = NoiseSpec(cfg["observations"]) if "observations" in cfg else None
        self.act_spec = NoiseSpec(cfg["actions"]) if "actions" in cfg else None

        actor = cfg.get("actor_params", {}).get("humanoid", {})
        # whole-actor geometric scale (reference base_task.py:346-355
        # `prop_name == 'scale'` → gym.set_actor_scale): one (B,) scalar per
        # env scaling link offsets/geom sizes (mass ∝ s³, inertia ∝ s⁵ in
        # the engine)
        self.scale_spec = NoiseSpec(actor["scale"]) if "scale" in actor else None
        rb = actor.get("rigid_body_properties", {})
        self.mass_spec = NoiseSpec(rb["mass"]) if "mass" in rb else None
        rs = actor.get("rigid_shape_properties", {})
        self.friction_spec = NoiseSpec(rs["friction"]) if "friction" in rs else None
        self.restitution_spec = (
            NoiseSpec(rs["restitution"]) if "restitution" in rs else None)
        dof = actor.get("dof_properties", {})
        self.stiffness_spec = NoiseSpec(dof["stiffness"]) if "stiffness" in dof else None
        self.damping_spec = NoiseSpec(dof["damping"]) if "damping" in dof else None
        # sim-parameter randomization (reference sim_params block): gravity
        sim = cfg.get("sim_params", {})
        self.gravity_spec = NoiseSpec(sim["gravity"]) if "gravity" in sim else None

    # -- per-step noise -------------------------------------------------------

    def randomize_actions(self, rng, actions, step_count):
        if not (self.enabled and self.act_spec):
            return actions
        return self.act_spec.apply(rng, actions, step_count)

    def randomize_observations(self, rng, obs, step_count):
        if not (self.enabled and self.obs_spec):
            return obs
        return self.obs_spec.apply(rng, obs, step_count)

    # -- per-env property scales (resampled on schedule) ----------------------

    def init_scales(self, B: int, base_restitution: float = 0.0,
                    num_bodies: int = 0, num_shapes: int = 0,
                    num_dofs: int = 0) -> Dict[str, jnp.ndarray]:
        """Build the property-scale state. With ``num_bodies``/``num_shapes``/
        ``num_dofs`` given, mass / friction / PD-gain knobs are per-env-PER-
        ELEMENT arrays — the reference's granularity: ``apply_randomizations``
        samples every rigid body's mass, every shape's friction, and every
        dof's stiffness/damping independently (reference
        base_task.py:332-386 iterates ``prop_idx``). Zero dims keep the
        coarser per-env scalars (legacy callers / whole-actor scaling)."""
        self.base_restitution = float(base_restitution)

        def ones(n):
            return jnp.ones((B, n)) if n > 0 else jnp.ones(B)

        return {
            "friction_scale": ones(num_shapes),
            "mass_scale": ones(num_bodies),
            "actor_scale": jnp.ones(B),             # whole-actor by definition
            "stiffness_scale": ones(num_dofs),
            "damping_scale": ones(num_dofs),
            "gravity_scale": jnp.ones(B),           # sim-global by nature
            "restitution": jnp.full((B,), float(base_restitution)),
            "dr_count": jnp.zeros(B, jnp.int32),
            # global control-step counter driving the per-property schedules
            # (reference base_task.py last_step-based linear ramps)
            "step_count": jnp.zeros(()),
        }

    def tick(self, scales: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(scales)
        out["step_count"] = scales["step_count"] + 1.0
        return out

    def resample_scales(self, rng, scales: Dict[str, jnp.ndarray], mask):
        """Resample property scales for envs in `mask` (at reset, respecting
        the randomization frequency). Schedules ramp with the global
        step counter carried in the scales dict."""
        if not self.enabled:
            return scales
        B = scales["friction_scale"].shape[0]
        step_count = scales["step_count"]
        out = dict(scales)
        due = mask & (scales["dr_count"] % jnp.maximum(self.frequency, 1) == 0)
        # setup-only properties are randomized exactly once, at the env's
        # first reset, regardless of the rerandomization frequency
        due_setup = mask & (scales["dr_count"] == 0)
        keys = jax.random.split(rng, 7)

        def _upd(spec, key, cur, base=None):
            # sampling at the CURRENT knob shape gives per-element draws for
            # the per-body/per-shape/per-dof knobs (reference granularity)
            if base is None:
                base = jnp.ones_like(cur)
            d = due_setup if spec.setup_only else due
            d = d.reshape(d.shape + (1,) * (cur.ndim - 1))
            v = spec.apply(key, base, step_count)
            return jnp.where(d, v, cur)

        if self.friction_spec:
            out["friction_scale"] = _upd(
                self.friction_spec, keys[0], scales["friction_scale"])
        if self.mass_spec:
            out["mass_scale"] = _upd(
                self.mass_spec, keys[1], scales["mass_scale"])
        if self.stiffness_spec:
            out["stiffness_scale"] = _upd(
                self.stiffness_spec, keys[2], scales["stiffness_scale"])
        if self.damping_spec:
            out["damping_scale"] = _upd(
                self.damping_spec, keys[3], scales["damping_scale"])
        if self.gravity_spec:
            out["gravity_scale"] = _upd(
                self.gravity_spec, keys[4], scales["gravity_scale"])
        if self.restitution_spec:
            base = jnp.full((B,), getattr(self, "base_restitution", 0.0))
            out["restitution"] = jnp.clip(_upd(
                self.restitution_spec, keys[5], scales["restitution"], base),
                0.0, 1.0)
        if self.scale_spec:
            out["actor_scale"] = jnp.clip(_upd(
                self.scale_spec, keys[6], scales["actor_scale"]), 0.1, 10.0)
        if self.generator is not None:
            # correlated external samples override the independent draws;
            # per-env (B,) generator outputs broadcast over element dims
            gen_rng = jax.random.fold_in(rng, 101)
            for name, v in self.generator(gen_rng, B).items():
                if name not in out:
                    raise KeyError(f"actor_params_generator produced unknown "
                                   f"property {name!r}")
                cur = scales[name]
                v = jnp.asarray(v)
                if v.ndim < cur.ndim:
                    v = v.reshape(v.shape + (1,) * (cur.ndim - v.ndim))
                d = due.reshape(due.shape + (1,) * (cur.ndim - 1))
                out[name] = jnp.where(d, v, cur)
        out["dr_count"] = scales["dr_count"] + mask.astype(jnp.int32)
        return out
