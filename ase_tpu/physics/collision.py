"""Collision detection: analytic primitive tests producing a fixed-size
contact set (static shapes for XLA).

Replaces PhysX's broadphase/narrowphase for the small primitive worlds used by
humanoid character RL (reference scene construction:
``ase/env/tasks/humanoid.py:221-298`` — capsule/sphere/box character vs ground
plane, optional free props, optional self-collision).

Strategy: enumerate a *static* candidate list (unrolled at trace time —
geom-vs-plane points plus a precomputed self/prop pair list), score every
candidate by penetration depth, then ``top_k`` down to a fixed contact budget.
Inactive candidates carry depth < 0 and are masked in the solver.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.ops import quat as rot
from ase_tpu.physics import model as M

_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class Contacts(NamedTuple):
    pos: jnp.ndarray      # (K, 3) world contact point
    normal: jnp.ndarray   # (K, 3) unit, points from body_b into body_a
    depth: jnp.ndarray    # (K,) penetration (>0 means touching)
    body_a: jnp.ndarray   # (K,) int32 body index (props are nb + k)
    body_b: jnp.ndarray   # (K,) int32; -1 = static world (ground)
    friction: jnp.ndarray # (K,)


def geom_world_pose(model: M.Model, body_R, body_pos, prop_R, prop_pos):
    """World position/rotation of every geom.

    body_R (nb,3,3), body_pos (nb,3); prop_R (np,3,3), prop_pos (np,3).
    Returns (ng,3) positions and (ng,3,3) rotations.
    """
    nb = model.nb
    poses, rots = [], []
    gq_R = rot.quat_to_rotation_matrix(model.geom_quat)
    for g in range(model.ng):
        b = model.geom_body[g]
        if b < nb:
            Rb, pb = body_R[b], body_pos[b]
        else:
            Rb, pb = prop_R[b - nb], prop_pos[b - nb]
        poses.append(pb + Rb @ model.geom_pos[g])
        rots.append(Rb @ gq_R[g])
    return jnp.stack(poses), jnp.stack(rots)


# ---------------------------------------------------------------------------
# plane (ground z=0) candidates
# ---------------------------------------------------------------------------

_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=np.float32,
)


def plane_candidates(model: M.Model, g_pos, g_rot):
    """Candidate contacts of every geom against the ground plane z=0."""
    pts, depths, normals, bodies, fric = [], [], [], [], []
    up = jnp.array([0.0, 0.0, 1.0])
    for g in range(model.ng):
        gt = model.geom_types[g]
        b = model.geom_body[g]
        size = model.geom_size[g]
        mu = jnp.sqrt(jnp.maximum(model.geom_friction[g] * model.plane_friction, 0.0))
        p, R = g_pos[g], g_rot[g]
        if gt == M.GEOM_SPHERE:
            cands = [p - up * size[0]]
        elif gt == M.GEOM_CAPSULE:
            axis = R[:, 2]
            cands = [
                p + axis * size[1] - up * size[0],
                p - axis * size[1] - up * size[0],
            ]
        elif gt == M.GEOM_BOX:
            corners = _einsum("ij,cj->ci", R, jnp.asarray(_BOX_CORNERS) * size[None, :])
            cands = [p + corners[c] for c in range(8)]
        elif gt == M.GEOM_CYLINDER:
            axis = R[:, 2]
            # deepest rim point of each disc face: step radially along the
            # horizontal projection of -z relative to the axis
            t = -up + axis * axis[2]
            t = t / jnp.maximum(jnp.linalg.norm(t), 1e-6)
            cands = [
                p + axis * size[1] + t * size[0],
                p - axis * size[1] + t * size[0],
            ]
        else:
            cands = []
        for c in cands:
            pts.append(c)
            depths.append(-c[2])
            normals.append(up)
            bodies.append(b)
            fric.append(mu)
    return pts, depths, normals, bodies, fric


# ---------------------------------------------------------------------------
# static pair list (self-collision + props)
# ---------------------------------------------------------------------------

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


def _segment_points(p, R, half_len):
    axis = R[:, 2]
    return p - axis * half_len, p + axis * half_len


def _closest_on_segment(a0, a1, p):
    d = a1 - a0
    t = jnp.dot(p - a0, d) / jnp.maximum(jnp.dot(d, d), 1e-9)
    t = jnp.clip(t, 0.0, 1.0)
    return a0 + t * d


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


def _sphere_sphere(p1, r1, p2, r2):
    d = p1 - p2
    dist = jnp.linalg.norm(d)
    # degenerate coincident centers: fall back to +z so the normal stays unit
    safe = dist > 1e-6
    n = jnp.where(safe, d / jnp.where(safe, dist, 1.0), jnp.array([0.0, 0.0, 1.0]))
    depth = r1 + r2 - dist
    pos = p2 + n * (r2 - 0.5 * depth)
    return pos, n, depth


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


def pair_candidates(model: M.Model, pairs, g_pos, g_rot):
    """Candidate contacts for the static pair list. Normal points from geom j
    (body_b) into geom i (body_a)."""
    pts, depths, normals, bodies_a, bodies_b, fric = [], [], [], [], [], []

    def sphere_of(g):
        return g_pos[g], model.geom_size[g][0]

    def add(pos, n, depth, i, j):
        pts.append(pos)
        normals.append(n)
        depths.append(depth)
        bodies_a.append(model.geom_body[i])
        bodies_b.append(model.geom_body[j])
        fric.append(jnp.sqrt(jnp.maximum(model.geom_friction[i] * model.geom_friction[j], 0.0)))

    for (i, j) in pairs:
        ti, tj = model.geom_types[i], model.geom_types[j]
        # order so the "simpler" geom comes first where it helps
        if ti == M.GEOM_SPHERE and tj == M.GEOM_SPHERE:
            p1, r1 = sphere_of(i)
            p2, r2 = sphere_of(j)
            pos, n, d = _sphere_sphere(p1, r1, p2, r2)
            add(pos, n, d, i, j)
        elif {ti, tj} == {M.GEOM_SPHERE, M.GEOM_CAPSULE} or {ti, tj} == {M.GEOM_SPHERE, M.GEOM_CYLINDER}:
            si, ci = (i, j) if ti == M.GEOM_SPHERE else (j, i)
            pc, rc = sphere_of(si)
            a0, a1 = _segment_points(g_pos[ci], g_rot[ci], model.geom_size[ci][1])
            q = _closest_on_segment(a0, a1, pc)
            pos, n, d = _sphere_sphere(pc, rc, q, model.geom_size[ci][0])
            if si == i:
                add(pos, n, d, i, j)
            else:
                add(pos, -n, d, i, j)
        elif ti in (M.GEOM_CAPSULE, M.GEOM_CYLINDER) and tj in (M.GEOM_CAPSULE, M.GEOM_CYLINDER):
            a0, a1 = _segment_points(g_pos[i], g_rot[i], model.geom_size[i][1])
            b0, b1 = _segment_points(g_pos[j], g_rot[j], model.geom_size[j][1])
            pa, pb = _segment_segment(a0, a1, b0, b1)
            pos, n, d = _sphere_sphere(pa, model.geom_size[i][0], pb, model.geom_size[j][0])
            add(pos, n, d, i, j)
        elif M.GEOM_BOX in (ti, tj) and (ti != M.GEOM_BOX or tj != M.GEOM_BOX):
            # box vs sphere/capsule: test sample spheres against the box
            bi, oi = (i, j) if ti == M.GEOM_BOX else (j, i)
            half = model.geom_size[bi]
            Rb, pb = g_rot[bi], g_pos[bi]
            if model.geom_types[oi] == M.GEOM_SPHERE:
                samples = [(g_pos[oi], model.geom_size[oi][0])]
            else:
                a0, a1 = _segment_points(g_pos[oi], g_rot[oi], model.geom_size[oi][1])
                r = model.geom_size[oi][0]
                samples = [(a0, r), (0.5 * (a0 + a1), r), (a1, r)]
            for (c, r) in samples:
                c_local = Rb.T @ (c - pb)
                dpt, n_l, surf_l = _point_box_depth(c_local, half)
                n_w = Rb @ n_l
                depth = dpt + r
                pos = pb + Rb @ surf_l
                # n_w points out of the box toward the sphere
                if bi == i:
                    add(pos, -n_w, depth, i, j)
                else:
                    add(pos, n_w, depth, i, j)
        elif ti == M.GEOM_BOX and tj == M.GEOM_BOX:
            # vertex-vs-box both ways (adequate for sword/target style hits)
            for (src, dst) in ((i, j), (j, i)):
                half_s = model.geom_size[src]
                half_d = model.geom_size[dst]
                Rs, ps = g_rot[src], g_pos[src]
                Rd, pd = g_rot[dst], g_pos[dst]
                corners = _einsum("ij,cj->ci", Rs, jnp.asarray(_BOX_CORNERS) * half_s[None, :]) + ps
                # only test the 4 deepest corners to bound candidate count
                c_local = _einsum("ji,cj->ci", Rd, corners - pd)
                dpths = jax.vmap(lambda cl: _point_box_depth(cl, half_d)[0])(c_local)
                order = jnp.argsort(-dpths)[:4]
                for k in range(4):
                    cl = c_local[order[k]]
                    dpt, n_l, surf_l = _point_box_depth(cl, half_d)
                    n_w = Rd @ n_l
                    pos = pd + Rd @ surf_l
                    if src == i:
                        add(pos, n_w, dpt, i, j)
                    else:
                        add(pos, -n_w, dpt, i, j)
        else:
            raise ValueError(f"unhandled pair types {ti},{tj}")
    return pts, depths, normals, bodies_a, bodies_b, fric


def detect(
    model: M.Model,
    body_R,
    body_pos,
    prop_R,
    prop_pos,
    pairs,
    max_contacts: int,
) -> Contacts:
    g_pos, g_rot = geom_world_pose(model, body_R, body_pos, prop_R, prop_pos)

    pts, depths, normals, bodies_a, fric = plane_candidates(model, g_pos, g_rot)
    bodies_b = [-1] * len(pts)

    if pairs:
        p2, d2, n2, ba2, bb2, f2 = pair_candidates(model, pairs, g_pos, g_rot)
        pts += p2
        depths += d2
        normals += n2
        bodies_a += ba2
        bodies_b += bb2
        fric += f2

    pos = jnp.stack(pts)
    depth = jnp.stack(depths)
    normal = jnp.stack(normals)
    ba = jnp.asarray(np.asarray(bodies_a, dtype=np.int32))
    bb = jnp.asarray(np.asarray(bodies_b, dtype=np.int32))
    mu = jnp.stack(fric)

    k = min(max_contacts, pos.shape[0])
    _, idx = jax.lax.top_k(depth, k)
    return Contacts(
        pos=pos[idx], normal=normal[idx], depth=depth[idx],
        body_a=ba[idx], body_b=bb[idx], friction=mu[idx],
    )
