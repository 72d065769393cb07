"""Shared collision types, static pair filtering, and primitive tests.

The live narrow-phases are ``collision2`` (vmapped AoS A/B path) and
``collision3`` (SoA batch default); this module holds what they share:
the fixed-size ``Contacts`` contract consumed by the solvers, the static
articulation-filtered pair list (the analog of PhysX's broadphase filter
setup for the scenes built in reference ``ase/env/tasks/humanoid.py:221-298``),
and the closed-form primitive tests used by both narrow-phases.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax.numpy as jnp

from ase_tpu.physics import model as M


class Contacts(NamedTuple):
    pos: jnp.ndarray      # (K, 3) world contact point
    normal: jnp.ndarray   # (K, 3) unit, points from body_b into body_a
    depth: jnp.ndarray    # (K,) penetration (>0 means touching)
    body_a: jnp.ndarray   # (K,) int32 body index (props are nb + k)
    body_b: jnp.ndarray   # (K,) int32; -1 = static world (ground)
    friction: jnp.ndarray # (K,)


def _weld_group(model: M.Model, b: int) -> int:
    """Nearest self-or-ancestor body carrying a joint (welds merge)."""
    while b < model.nb and model.jtype[b] == -1:
        b = model.parents[b]
    return b


def collision_pairs(
    model: M.Model, enable_self: bool = True
) -> List[Tuple[int, int]]:
    """Geom index pairs to test. Excludes same/welded bodies and
    parent-child pairs (standard articulation filtering)."""
    pairs = []
    nb = model.nb
    for i in range(model.ng):
        for j in range(i + 1, model.ng):
            bi, bj = model.geom_body[i], model.geom_body[j]
            both_char = bi < nb and bj < nb
            if both_char and not enable_self:
                continue
            if both_char:
                gi, gj = _weld_group(model, bi), _weld_group(model, bj)
                if gi == gj:
                    continue
                if model.parents[gi] >= 0 and _weld_group(model, model.parents[gi]) == gj:
                    continue
                if model.parents[gj] >= 0 and _weld_group(model, model.parents[gj]) == gi:
                    continue
            pairs.append((i, j))
    return pairs


def _segment_segment(a0, a1, b0, b1):
    """Closest points between two segments (standard clamped solve)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(jnp.abs(denom) > 1e-9, (b * f - c * e) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = (b * s + f) / jnp.maximum(e, 1e-9)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(t != t_cl, jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-9), 0.0, 1.0), s)
    pa = a0 + d1 * s
    pb = b0 + d2 * t_cl
    return pa, pb


def _point_box_depth(p_local, half):
    """Penetration of a point into a box (box frame). Returns (depth, normal_local, surface_point_local)."""
    # distance to each face (positive inside)
    d_faces = half - jnp.abs(p_local)
    inside = jnp.all(d_faces > 0)
    # outside: clamp
    clamped = jnp.clip(p_local, -half, half)
    out_vec = p_local - clamped
    out_dist = jnp.linalg.norm(out_vec) + 1e-9
    # inside: push out of nearest face
    k = jnp.argmin(d_faces)
    sign = jnp.sign(p_local)[k]
    n_in = jnp.zeros(3).at[k].set(jnp.where(sign == 0, 1.0, sign))
    depth_in = d_faces[k]
    n_out = out_vec / out_dist
    depth_out = -out_dist
    n = jnp.where(inside, n_in, n_out)
    depth = jnp.where(inside, depth_in, depth_out)
    surf = jnp.where(inside, p_local + n_in * depth_in, clamped)
    return depth, n, surf
