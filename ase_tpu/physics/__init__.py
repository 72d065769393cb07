"""TPU-native articulated rigid-body physics (replaces Isaac Gym/PhysX)."""

from ase_tpu.physics import collision, dynamics, engine, mjcf, model, solver  # noqa: F401
