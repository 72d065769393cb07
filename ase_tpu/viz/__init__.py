"""Visualization tools (matplotlib, offline)."""
from ase_tpu.viz import plotter  # noqa: F401
