"""Batch-last (SoA) dynamics assembly: the TPU-layout twin of
``dynamics.compute_dynamics``.

The vmapped assembly materializes (B, nb, 6, 6) / (B, nu, 6) tensors whose
small trailing dims tile to (8, 128) on TPU — ~40x padded HBM traffic, which
made dynamics the second-largest substep cost (8.6 ms at B=4096). Here every
vector/matrix entry is its own ``(n, B)`` array (bodies/dofs in sublanes,
envs in lanes), spatial inertias use their 10-parameter (m, h, I) form, and
the mass matrix is produced directly in the (nu, nu, B) layout the batch-last
Cholesky consumes. Semantics are pinned to ``dynamics.compute_dynamics`` by
``tests/test_dynamics2.py``.

Same physical model as the reference's PhysX articulations (reference
``ase/env/tasks/base_task.py:403-407``): world-frame composite-rigid-body
mass matrix, velocity-product bias forces, gravity, Stable-PD implicit
damping on the diagonal.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ase_tpu.ops import quat as rot_ops
from ase_tpu.physics import dynamics
from ase_tpu.physics import model as M

import functools
import jax

# mask matmuls sum f32 values and must not round through bf16
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _mm_multi(mat, comps):
    """Apply one (m, n) matrix to k (n, B) component planes in a single
    matmul: concat along lanes → (m, kB) → split. Collapses k small MXU
    dispatches (and their layout copies) into one."""
    k = len(comps)
    out = _mm(mat, jnp.concatenate(comps, axis=1))
    return tuple(jnp.split(out, k, axis=1))


class _Static(NamedTuple):
    db_dyn: np.ndarray     # (nu,) owning body for inertia/position gathers
    db_rot: np.ndarray     # (nu,) rotation source; nb = identity (root dofs)
    axloc: np.ndarray      # (nu, 3) local axis (spherical e_k / revolute axis
                           #         / root-angular world e_k)
    e_lin: np.ndarray      # (nu, 3) world axis for root linear dofs
    is_ang: np.ndarray     # (nu, 1) angular-like dof (root ang/sph/rev)
    is_joint: np.ndarray   # (nu, 1) articulation joint dof (not root)
    Wm: np.ndarray         # (nu, nu) CRBA path mask
    both: np.ndarray       # (nu, nu)
    S: np.ndarray          # (nb, nb) ancestor-or-self subtree mask
    A: np.ndarray          # (nb, nu) ancestor-dof mask
    diag: np.ndarray       # (nu,) armature (+ root angular damping slot mask)
    mass: np.ndarray       # (nb,)
    msub: np.ndarray       # (nb,) subtree mass sums
    inertia: np.ndarray    # (nb, 3, 3) local COM inertia
    com: np.ndarray        # (nb, 3) local COM offset


def _static(model: M.Model) -> _Static:
    nb, nu = model.nb, model.nu
    db = dynamics.dof_body(model)
    A, Wm, both, S = dynamics._crba_masks(model)

    db_rot = db.copy()
    joint_axis_np = np.asarray(model.joint_axis)
    axloc = np.zeros((nu, 3), np.float32)
    e_lin = np.zeros((nu, 3), np.float32)
    is_ang = np.zeros((nu, 1), np.float32)
    is_joint = np.zeros((nu, 1), np.float32)
    for b in range(nb):
        jt = model.jtype[b]
        off = model.dof_offset[b]
        if jt == M.FREE:
            for k in range(3):
                e_lin[off + k, k] = 1.0                 # linear dofs
                axloc[off + 3 + k, k] = 1.0             # angular dofs
                is_ang[off + 3 + k] = 1.0
                db_rot[off + k] = nb                    # identity rotation
                db_rot[off + 3 + k] = nb
        elif jt == M.SPHERICAL:
            for k in range(3):
                axloc[off + k, k] = 1.0
                is_ang[off + k] = 1.0
                is_joint[off + k] = 1.0
        elif jt == M.REVOLUTE:
            axloc[off] = joint_axis_np[b]
            is_ang[off] = 1.0
            is_joint[off] = 1.0

    return _Static(
        db_dyn=db, db_rot=db_rot, axloc=axloc, e_lin=e_lin,
        is_ang=is_ang, is_joint=is_joint, Wm=Wm, both=both, S=S, A=A,
        diag=np.zeros(nu, np.float32),
        mass=np.asarray(model.mass, np.float32)[:nb],
        msub=(S @ np.asarray(model.mass, np.float32)[:nb]),
        inertia=np.asarray(model.inertia, np.float32)[:nb],
        com=np.asarray(model.com, np.float32)[:nb],
    )


def _quat_R(q4):
    """Rotation components (row-major 9-tuple) from quat comps (x,y,z,w)."""
    x, y, z, w = q4
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    return (
        1.0 - (yy + zz), xy - wz, xz + wy,
        xy + wz, 1.0 - (xx + zz), yz - wx,
        xz - wy, yz + wx, 1.0 - (xx + yy),
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _symprod_RIR(Rc, I):
    """6 upper components of R I R^T with I a static (nb, 3, 3) symmetric
    matrix (broadcast over lanes) and Rc a 9-tuple of (nb, B)."""
    Ii = tuple(jnp.asarray(I[:, i, j])[:, None] for i in range(3) for j in range(3))
    # T = R I  (9 comps)
    T = []
    for i in range(3):
        for j in range(3):
            T.append(
                Rc[3 * i + 0] * Ii[0 + j] + Rc[3 * i + 1] * Ii[3 + j] + Rc[3 * i + 2] * Ii[6 + j]
            )
    # S = T R^T, symmetric: return (xx, xy, xz, yy, yz, zz)
    def ent(i, j):
        return T[3 * i + 0] * Rc[3 * j + 0] + T[3 * i + 1] * Rc[3 * j + 1] + T[3 * i + 2] * Rc[3 * j + 2]

    return ent(0, 0), ent(0, 1), ent(0, 2), ent(1, 1), ent(1, 2), ent(2, 2)


def _sym_mv(Ssym, v):
    """Symmetric 3x3 (6 comps xx,xy,xz,yy,yz,zz) times vector comps."""
    xx, xy, xz, yy, yz, zz = Ssym
    return (
        xx * v[0] + xy * v[1] + xz * v[2],
        xy * v[0] + yy * v[1] + yz * v[2],
        xz * v[0] + yz * v[1] + zz * v[2],
    )


def compute_dynamics_batch_last(model: M.Model, states, kin, dt: float,
                                mass_scale=None, gravity_scale=None,
                                damping_scale=None, actor_scale=None):
    """Batched dynamics assembly, batch-last layout.

    Returns (M_bl (nu, nu, B), bias (B, nu), Phi (B, nu, 6)) matching
    ``vmap(dynamics.compute_dynamics)`` up to layout.

    ``mass_scale``/``gravity_scale`` are optional domain-randomization
    multipliers (reference base_task.py:306-386 actor
    rigid_body_properties.mass / sim_params.gravity). ``mass_scale`` is
    per-env (B,) — whole-actor density — or per-env-per-body (B, nb),
    matching the reference's independent per-rigid-body sampling
    (base_task.py:332-386 iterates prop_idx). ``damping_scale`` is per-env
    (B,) or per-actuated-dof (B, nd). Mass scaling is exact: every
    inertia-linear term (mass matrix before the armature diagonal, all
    velocity-product and gravity bias forces) is scaled; motor armature and
    damping are reflected rotor properties and intentionally NOT scaled.
    """
    st = _static(model)
    nb, nu = model.nb, model.nu
    B = states.root_pos.shape[0]
    # per-body mass DR folds into the body masses/inertias BEFORE composite
    # assembly (density scaling: the geometry is unchanged, so each body's
    # rotational inertia scales with its mass); the (B,) whole-actor case
    # keeps the cheaper post-assembly broadcast below
    per_body_mass = mass_scale is not None and mass_scale.ndim == 2
    ms_bl = mass_scale.T if per_body_mass else None     # (nb, B)
    # geometric actor scale (reference gym.set_actor_scale): the kin passed
    # in must come from the SAME scaled FK; mass properties scale like a
    # constant-density resize — mass x s^3, rotational inertia x s^5 (COM
    # offsets ride the scaled kin.com_world). Folded into the per-body mass
    # path with a separate s^2 inertia surcharge.
    isym_extra = None
    if actor_scale is not None:
        s_bl = actor_scale[None, :]                      # (1, B)
        s3 = s_bl * s_bl * s_bl
        if ms_bl is None:
            ms_bl = s3 if mass_scale is None else mass_scale[None, :] * s3
            ms_bl = jnp.broadcast_to(ms_bl, (nb, B))
        else:
            ms_bl = ms_bl * s3
        per_body_mass = True
        isym_extra = s_bl * s_bl                         # inertia: s^5 total

    # --- kinematics components, (nb, B) ---
    q = kin.body_quat                                  # (B, nb, 4)
    Rc = _quat_R(tuple(q[..., k].T for k in range(4)))  # 9 x (nb, B)
    p = tuple(kin.body_pos[..., k].T for k in range(3))
    w = tuple(kin.body_vel[..., k].T for k in range(3))
    vl = tuple(kin.body_vel[..., 3 + k].T for k in range(3))
    cw = tuple(kin.com_world[..., k].T for k in range(3))
    origin = tuple(states.root_pos[:, k][None, :] for k in range(3))  # (1, B)

    # --- per-dof motion subspace Phi = [ang, lin], (nu, B) components ---
    ident = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    Rext = tuple(
        jnp.concatenate([Rc[k], jnp.full((1, B), ident[k])], axis=0)
        for k in range(9)
    )
    dbr, dbd = st.db_rot, st.db_dyn
    ax = tuple(jnp.asarray(st.axloc[:, k])[:, None] for k in range(3))
    a = (
        Rext[0][dbr] * ax[0] + Rext[1][dbr] * ax[1] + Rext[2][dbr] * ax[2],
        Rext[3][dbr] * ax[0] + Rext[4][dbr] * ax[1] + Rext[5][dbr] * ax[2],
        Rext[6][dbr] * ax[0] + Rext[7][dbr] * ax[1] + Rext[8][dbr] * ax[2],
    )
    pd = tuple(c[dbd] for c in p)                      # (nu, B)
    lever = tuple(o - c for o, c in zip(origin, pd))
    is_ang = jnp.asarray(st.is_ang)
    is_joint = jnp.asarray(st.is_joint)
    el = tuple(jnp.asarray(st.e_lin[:, k])[:, None] for k in range(3))
    phi_a = tuple(c * is_ang for c in a)
    axl = _cross(a, lever)
    phi_l = tuple(c * is_ang + e for c, e in zip(axl, el))

    # Phi-dot: joint dofs rotate with the body; root-angular axes are fixed
    # world axes (angular derivative zero, linear term from the moving point)
    wd = tuple(c[dbd] for c in w)
    vo = tuple(v[dbd] + cr for v, cr in zip(vl, _cross(wd, lever)))
    dphi_a = tuple(c * is_joint for c in _cross(wd, phi_a))
    dphi_l = tuple(
        (c1 + c2) * is_ang
        for c1, c2 in zip(_cross(wd, phi_l), _cross(vo, phi_a))
    )

    # --- spatial inertias in (m, h, I) form, (nb, B) ---
    Isym = _symprod_RIR(Rc, st.inertia)                # I_com in world axes
    c_off = tuple(cc - o for cc, o in zip(cw, origin)) # com - origin
    mass = jnp.asarray(st.mass)[:, None]
    if per_body_mass:
        mass = mass * ms_bl
        i_f = ms_bl if isym_extra is None else ms_bl * isym_extra
        Isym = tuple(c * i_f for c in Isym)
    h = tuple(mass * c for c in c_off)
    c2 = _dot(c_off, c_off)
    # TL = I_w + m((c.c)δ - c c^T)
    TL = (
        Isym[0] + mass * (c2 - c_off[0] * c_off[0]),
        Isym[1] - mass * c_off[0] * c_off[1],
        Isym[2] - mass * c_off[0] * c_off[2],
        Isym[3] + mass * (c2 - c_off[1] * c_off[1]),
        Isym[4] - mass * c_off[1] * c_off[2],
        Isym[5] + mass * (c2 - c_off[2] * c_off[2]),
    )

    # --- composite (subtree) inertias: static masked sums over bodies ---
    S = jnp.asarray(st.S)
    Sc = _mm_multi(S, TL + h)
    TLc, hc = Sc[:6], Sc[6:]

    # --- F = Ic[body(d)] Phi(d); G/M assembly ---
    TLd = tuple(t[dbd] for t in TLc)
    hd = tuple(t[dbd] for t in hc)
    if per_body_mass:
        md = (S @ mass)[dbd]                           # (nu, B) subtree mass
    else:
        md = jnp.asarray(st.msub[st.db_dyn])[:, None]
    F_a = tuple(
        s + c for s, c in zip(_sym_mv(TLd, phi_a), _cross(hd, phi_l))
    )
    F_l = tuple(
        c + md * pl for c, pl in zip(_cross(phi_a, hd), phi_l)
    )

    # G[d, e] = F(d) . Phi(e): six outer-product accumulations on (nu, nu, B)
    G = sum(
        Fk[:, None, :] * Pk[None, :, :]
        for Fk, Pk in zip(F_a + F_l, phi_a + phi_l)
    )
    Wm = jnp.asarray(st.Wm)[:, :, None]
    both = jnp.asarray(st.both)[:, :, None]
    WG = Wm * G
    M_bl = WG + jnp.transpose(WG, (1, 0, 2)) - both * G

    # --- bias forces ---
    u = states.u[:, :nu].T                             # (nu, B)
    A_ = jnp.asarray(st.A)
    phiu_a = tuple(c * u for c in dphi_a)
    phiu_l = tuple(c * u for c in dphi_l)
    Ac = _mm_multi(A_, phiu_a + phiu_l
                   + tuple(c * u for c in phi_a + phi_l))
    ab_a, ab_l = Ac[0:3], Ac[3:6]                      # (nb, B) bias accel
    vs_a, vs_l = Ac[6:9], Ac[9:12]                     # body spatial velocity

    # Iv = I_sp v  (per body, (m, h, I) form)
    Iv_a = tuple(s + c for s, c in zip(_sym_mv(TL, vs_a), _cross(h, vs_l)))
    Iv_l = tuple(c + mass * vlk for c, vlk in zip(_cross(vs_a, h), vs_l))
    # f_vel = v x* Iv
    fv_a = tuple(
        c1 + c2 for c1, c2 in zip(_cross(vs_a, Iv_a), _cross(vs_l, Iv_l))
    )
    fv_l = _cross(vs_a, Iv_l)
    # f_bias = I_sp a_bias + f_vel
    fb_a = tuple(
        s + c + f
        for s, c, f in zip(_sym_mv(TL, ab_a), _cross(h, ab_l), fv_a)
    )
    fb_l = tuple(
        c + mass * ak + f for c, ak, f in zip(_cross(ab_a, h), ab_l, fv_l)
    )
    # gravity at origin: [ (c-o) x mg, mg ]
    g = tuple(float(np.asarray(model.gravity)[k]) for k in range(3))
    if gravity_scale is not None:
        Fg = tuple(mass * gk * gravity_scale[None, :] for gk in g)
    else:
        Fg = tuple(mass * gk for gk in g)
    tau_g = _cross(c_off, Fg)
    ft_a = tuple(f - t for f, t in zip(fb_a, tau_g))
    ft_l = tuple(f - t for f, t in zip(fb_l, Fg))

    At = jnp.asarray(st.A.T)                           # (nu, nb)
    Fd = _mm_multi(At, ft_a + ft_l)
    Fd_a, Fd_l = Fd[:3], Fd[3:]
    bias = sum(p_ * f_ for p_, f_ in zip(phi_a + phi_l, Fd_a + Fd_l))

    # per-env mass scaling: M (pre-armature) and the bias are both linear in
    # the body inertias, so a whole-actor mass multiplier is one broadcast
    # (the per-body case was folded into mass/Isym before assembly above)
    if mass_scale is not None and not per_body_mass:
        M_bl = M_bl * mass_scale[None, None, :]
        bias = bias * mass_scale[None, :]

    # --- armature + SPD implicit damping on the diagonal ---
    rd = model.root_dofs
    diag = np.zeros(model.nu, np.float32)
    diag[rd:] = np.asarray(model.armature)
    if rd == 6:
        diag[3:6] += dt * float(np.asarray(model.ang_damping))
    damp = np.zeros(model.nu, np.float32)
    damp[rd:] = dt * np.asarray(model.damping)
    if damping_scale is None:
        eye = jnp.asarray(np.eye(nu, dtype=np.float32) * (diag + damp)[None, :])
        M_bl = M_bl + eye[:, :, None]
    else:
        # damping DR: only the dt*kd part of the implicit diagonal scales
        # (armature is a reflected rotor property, not a damper).
        # (B,) = per-env; (B, nd) = per-actuated-dof (reference dof_properties
        # randomization samples each dof independently, base_task.py:332-386)
        eye = jnp.asarray(np.eye(nu, dtype=np.float32) * diag[None, :])
        if damping_scale.ndim == 2:
            ds_full = jnp.ones((nu, B)).at[rd:, :].set(damping_scale.T)
            M_bl = (M_bl + eye[:, :, None]
                    + jnp.asarray(np.eye(nu, dtype=np.float32))[:, :, None]
                    * (jnp.asarray(damp)[:, None] * ds_full)[:, None, :])
        else:
            M_bl = (M_bl + eye[:, :, None]
                    + jnp.asarray(np.eye(nu, dtype=np.float32) * damp[None, :])[:, :, None]
                    * damping_scale[None, None, :])

    Phi = jnp.stack([c.T for c in phi_a + phi_l], axis=-1)   # (B, nu, 6)
    return M_bl, bias.T, Phi


# -- component-form batched FK ------------------------------------------------
#
# ``dynamics.fk`` under vmap walks the kinematic tree with (B, 3)/(B, 4)
# tensors whose trailing dims tile-pad 4 -> 128 lanes on TPU (~97% idle VPU
# lanes), and it runs three times per sim tick (each substep + the final
# state refresh). Here every quaternion/vector component is its own (B,)
# plane (envs dense in lanes); the tree walk is the same static Python loop,
# but XLA fuses the elementwise component chains into a handful of kernels.
# Output is the standard ``dynamics.Kin`` (equivalence pinned by
# tests/test_dynamics2.py).

def _qmul_c(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
            aw * bw - ax * bx - ay * by - az * bz)


def _qrot_c(q, v):
    """Rotate component 3-vector v by component quaternion q:
    v + 2 w (q×v) + 2 q×(q×v)."""
    x, y, z, w = q
    vx, vy, vz = v
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    return (vx + w * tx + (y * tz - z * ty),
            vy + w * ty + (z * tx - x * tz),
            vz + w * tz + (x * ty - y * tx))


def fk_batched(model: M.Model, states, actor_scale=None) -> "dynamics.Kin":
    """Batched position+velocity FK, component-form (see module note).

    ``actor_scale`` is an optional per-env (B,) geometric scale (reference
    ``gym.set_actor_scale``, base_task.py:346-355): every body-frame offset
    and COM offset is multiplied by it, so all link lengths scale while the
    joint state stays joint-space."""
    nb = model.nb
    s_ids, h_ids = dynamics.sph_ids(model), dynamics.hinge_ids(model)
    iq = np.asarray(model.body_iquat)          # (nb, 4) static
    ip = np.asarray(model.body_ipos)           # (nb, 3)
    ax = np.asarray(model.joint_axis)          # (nb, 3)
    com = np.asarray(model.com)[:nb]           # (nb, 3)

    rq = tuple(states.root_quat[:, k] for k in range(4))
    rp = tuple(states.root_pos[:, k] for k in range(3))
    u = states.u
    B = u.shape[0]
    zero = jnp.zeros(B)
    # static no-scale branch: keeps the default path free of extra multiplies
    if actor_scale is None:
        def S(c3):
            return c3
    else:
        def S(c3):
            return tuple(actor_scale * x for x in c3)

    quats, ps = [], []
    for b in range(nb):
        jt = model.jtype[b]
        if jt == M.FREE:
            jq = rq
        elif jt == M.SPHERICAL:
            s = s_ids.index(b)
            jq = tuple(states.joint_q[:, s, k] for k in range(4))
        elif jt == M.REVOLUTE:
            half = 0.5 * states.hinge_q[:, h_ids.index(b)]
            sn, cs = jnp.sin(half), jnp.cos(half)
            jq = (ax[b, 0] * sn, ax[b, 1] * sn, ax[b, 2] * sn, cs)
        else:
            jq = (zero, zero, zero, jnp.ones(B))
        lq = _qmul_c(tuple(iq[b]), jq)

        p = model.parents[b]
        if p == -1:
            quats.append(lq)
            if jt == M.FREE:
                ps.append(rp)
            else:
                off = S(tuple(jnp.asarray(ip[b, k]) for k in range(3)))
                ps.append(tuple(rp[k] + off[k] for k in range(3)))
        else:
            quats.append(_qmul_c(quats[p], lq))
            step = S(_qrot_c(quats[p], tuple(ip[b])))
            ps.append(tuple(ps[p][k] + step[k] for k in range(3)))

    # velocity FK: w/v of each body at its own origin, world axes
    vels = [None] * nb
    for b in range(nb):
        p = model.parents[b]
        if p == -1:
            if model.jtype[b] == M.FREE:
                w = (u[:, 3], u[:, 4], u[:, 5])
                v = (u[:, 0], u[:, 1], u[:, 2])
            else:
                w = v = (zero, zero, zero)
        else:
            wp, vp = vels[p]
            d = tuple(ps[b][k] - ps[p][k] for k in range(3))
            v = (vp[0] + wp[1] * d[2] - wp[2] * d[1],
                 vp[1] + wp[2] * d[0] - wp[0] * d[2],
                 vp[2] + wp[0] * d[1] - wp[1] * d[0])
            off = model.dof_offset[b]
            if model.jtype[b] == M.SPHERICAL:
                dw = _qrot_c(quats[b], (u[:, off], u[:, off + 1], u[:, off + 2]))
                w = tuple(wp[k] + dw[k] for k in range(3))
            elif model.jtype[b] == M.REVOLUTE:
                aw = _qrot_c(quats[b], tuple(ax[b]))
                w = tuple(wp[k] + aw[k] * u[:, off] for k in range(3))
            else:
                w = wp
        vels[b] = (w, v)

    body_quat = jnp.stack(
        [jnp.stack(q, axis=-1) for q in quats], axis=1)            # (B, nb, 4)
    body_pos = jnp.stack(
        [jnp.stack(pp, axis=-1) for pp in ps], axis=1)             # (B, nb, 3)
    body_vel = jnp.stack(
        [jnp.stack(w + v, axis=-1) for (w, v) in vels], axis=1)    # (B, nb, 6)
    R = rot_ops.quat_to_rotation_matrix(body_quat)                  # (B, nb, 3, 3)
    com_c = [S(_qrot_c(quats[b], tuple(com[b]))) for b in range(nb)]
    com_w = body_pos + jnp.stack(
        [jnp.stack(c, axis=-1) for c in com_c], axis=1)
    return dynamics.Kin(R, body_pos, body_quat, body_vel, com_w)
