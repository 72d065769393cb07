"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh
(the standard way to validate TPU sharding without a pod).
"""

import os
import sys

# The deployment environment injects a TPU plugin via PYTHONPATH sitecustomize
# that force-selects the TPU backend even when JAX_PLATFORMS=cpu. Tests must
# run on the virtual CPU mesh, so drop that path before jax import.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The plugin may already be registered (sitecustomize runs at interpreter
# boot); the config knob still forces platform selection back to cpu.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite re-jits the same module shapes
# across files/runs; caching cuts repeat wall-clock dramatically.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() >= 8, jax.devices()
