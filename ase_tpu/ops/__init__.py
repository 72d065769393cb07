"""Math and kernel ops for the TPU-native ASE framework."""

from ase_tpu.ops import quat, spatial  # noqa: F401
