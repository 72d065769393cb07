"""Physics model description: a static articulation + free props + geoms.

This is the TPU-native replacement for the reference's Isaac Gym asset layer
(``gym.load_asset`` / ``get_asset_*`` calls in reference
``ase/env/tasks/humanoid.py:221-284``): a single immutable pytree describing
the articulated character (tree topology, joint types, mass properties,
per-dof gains/limits) plus optional free rigid bodies (props: strike targets,
projectiles) and collision geometry.

Joint model (chosen to match the reference's dof semantics exactly —
``humanoid.py:183-195`` dof tables and ``motion_lib.py:296-324`` conversions):

* body 0 carries a FREE joint (7 pos / 6 vel);
* a run of 3 orthogonal x,y,z hinges in one MJCF body is treated as one
  SPHERICAL joint whose 3 dof coordinates are the exponential map of the local
  rotation (this is how Isaac Gym exposes them to the reference code);
* single hinges are REVOLUTE joints about their (unit) axis.

Generalized layout:
  q: root_pos(3) + root_quat(4) are kept separately; spherical joints store
     unit quaternions; revolute joints store angles.
  u (velocity): ``[root_lin_world(3), root_ang_world(3), joint dofs...]``
     where spherical dofs are the local (child-frame) angular velocity and
     revolute dofs are joint angle rates. Prop dofs (6 per prop,
     ``[lin_world, ang_world]``) are appended after the articulation dofs.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# joint types
FREE = 0
SPHERICAL = 1
REVOLUTE = 2

# geom types
GEOM_SPHERE = 0
GEOM_CAPSULE = 1
GEOM_BOX = 2
GEOM_CYLINDER = 3
GEOM_PLANE = 4


@struct.dataclass
class Model:
    # --- static topology (hashable; closed over by jit) ---
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    parents: Tuple[int, ...] = struct.field(pytree_node=False)          # (nb,)
    jtype: Tuple[int, ...] = struct.field(pytree_node=False)            # (nb,)
    # dof bookkeeping: per body, offset into the velocity vector u
    dof_offset: Tuple[int, ...] = struct.field(pytree_node=False)       # (nb,)
    nu: int = struct.field(pytree_node=False)                           # articulation dofs (incl. root 6)
    # reference-style dof tables (exclude the root; humanoid.py:183-195)
    dof_body_ids: Tuple[int, ...] = struct.field(pytree_node=False)
    dof_offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    num_props: int = struct.field(pytree_node=False)
    geom_types: Tuple[int, ...] = struct.field(pytree_node=False)       # (ng,)
    geom_body: Tuple[int, ...] = struct.field(pytree_node=False)        # (ng,) body index; props are nb + k

    # --- numeric parameters (device arrays) ---
    body_ipos: jnp.ndarray        # (nb, 3) joint anchor in parent frame
    body_iquat: jnp.ndarray       # (nb, 4) static rotation offset parent->body
    joint_axis: jnp.ndarray       # (nb, 3) hinge axis (unit, child frame)
    mass: jnp.ndarray             # (nb + np,)
    com: jnp.ndarray              # (nb + np, 3) in body frame
    inertia: jnp.ndarray          # (nb + np, 3, 3) about COM, body frame

    # per articulation-dof (size nd = nu - 6; excludes root)
    stiffness: jnp.ndarray        # PD kp
    damping: jnp.ndarray          # PD kd
    armature: jnp.ndarray
    dof_limit_lo: jnp.ndarray
    dof_limit_hi: jnp.ndarray
    motor_gear: jnp.ndarray       # effort scale for torque-mode actuation

    # geoms
    geom_pos: jnp.ndarray         # (ng, 3) in body frame
    geom_quat: jnp.ndarray        # (ng, 4) in body frame
    geom_size: jnp.ndarray        # (ng, 3) type-specific: sphere r__, capsule r h_, box hx hy hz
    geom_friction: jnp.ndarray    # (ng,)

    # simulation options
    gravity: jnp.ndarray          # (3,)
    plane_friction: jnp.ndarray   # scalar
    ang_damping: jnp.ndarray      # scalar, free-body angular damping
    max_ang_vel: jnp.ndarray      # scalar clamp

    @property
    def nb(self) -> int:
        return len(self.body_names)

    @property
    def root_dofs(self) -> int:
        return 6 if self.jtype[0] == FREE else 0

    @property
    def nd(self) -> int:
        """Actuated dof count (reference num_dof; excludes root + props)."""
        return self.nu - self.root_dofs

    @property
    def nv(self) -> int:
        """Total velocity dimension including props."""
        return self.nu + 6 * self.num_props

    @property
    def ng(self) -> int:
        return len(self.geom_types)

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)


# ---------------------------------------------------------------------------
# inertia helpers (host-side numpy; used by the MJCF/URDF builders)
# ---------------------------------------------------------------------------

def sphere_mass_inertia(radius: float, density: float):
    m = density * 4.0 / 3.0 * np.pi * radius**3
    i = 2.0 / 5.0 * m * radius**2
    return m, np.diag([i, i, i])


def box_mass_inertia(half: np.ndarray, density: float):
    full = 2.0 * np.asarray(half)
    m = density * full[0] * full[1] * full[2]
    ix = m / 12.0 * (full[1] ** 2 + full[2] ** 2)
    iy = m / 12.0 * (full[0] ** 2 + full[2] ** 2)
    iz = m / 12.0 * (full[0] ** 2 + full[1] ** 2)
    return m, np.diag([ix, iy, iz])


def cylinder_mass_inertia(radius: float, half_height: float, density: float):
    """Axis along local z."""
    h = 2.0 * half_height
    m = density * np.pi * radius**2 * h
    ixy = m / 12.0 * (3.0 * radius**2 + h**2)
    iz = 0.5 * m * radius**2
    return m, np.diag([ixy, ixy, iz])


def capsule_mass_inertia(radius: float, half_height: float, density: float):
    """Axis along local z; half_height excludes the caps."""
    r, h = radius, 2.0 * half_height
    m_cyl = density * np.pi * r**2 * h
    m_sph = density * 4.0 / 3.0 * np.pi * r**3
    m = m_cyl + m_sph
    # cylinder part
    ixy_c = m_cyl * (h**2 / 12.0 + r**2 / 4.0)
    iz_c = 0.5 * m_cyl * r**2
    # two hemispheres: inertia about capsule center via parallel axis
    i_s = 2.0 / 5.0 * (m_sph / 2.0) * r**2  # one hemisphere about own com-ish
    d = half_height + 3.0 / 8.0 * r          # hemisphere COM offset from center
    ixy_s = 2.0 * (i_s + (m_sph / 2.0) * d**2)
    iz_s = 2.0 * i_s
    return m, np.diag([ixy_c + ixy_s, ixy_c + ixy_s, iz_c + iz_s])


def rotate_inertia(R: np.ndarray, I: np.ndarray) -> np.ndarray:
    return R @ I @ R.T


def shift_inertia(I_com: np.ndarray, mass: float, offset: np.ndarray) -> np.ndarray:
    """Parallel axis: inertia about a point displaced by -offset from COM."""
    d = np.asarray(offset)
    return I_com + mass * (np.dot(d, d) * np.eye(3) - np.outer(d, d))


def combine_inertias(parts):
    """parts: list of (mass, com, I_com). Returns total (mass, com, I_com)."""
    total_m = sum(p[0] for p in parts)
    if total_m <= 0:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    com = sum(p[0] * np.asarray(p[1]) for p in parts) / total_m
    I = np.zeros((3, 3))
    for m, c, Ic in parts:
        I += shift_inertia(Ic, m, np.asarray(c) - com)
    return total_m, com, I
