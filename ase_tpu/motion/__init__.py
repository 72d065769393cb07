"""Motion data layer: skeletons, mocap clips, device-side motion library."""

from ase_tpu.motion import motion_lib, skeleton  # noqa: F401
