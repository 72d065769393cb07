"""Device mesh + sharding for data-parallel training over the env axis.

The TPU-native replacement for the reference's optional Horovod NCCL/MPI
data parallelism (reference ``run.py:36-50`` rank setup;
``common_agent.py:94-107,205-229`` allreduce call sites). Instead of a
process-group library, we build a ``jax.sharding.Mesh`` over all devices with
a single ``env`` axis and annotate:

* environment state, rollout tensors, minibatches → sharded over ``env``;
* network/optimizer/normalizer state → replicated.

XLA then inserts the gradient/stat ``psum`` collectives inside the jitted
train epoch automatically (they ride ICI, not host links). Multi-host
extends the same mesh via ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over devices (env batch)."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x: Any, sharding: NamedSharding) -> Any:
    """device_put that also works when the mesh spans multiple processes.

    In multi-controller JAX a plain ``device_put`` cannot target
    non-addressable devices; each process instead contributes its addressable
    shards of the (identically computed) global value via
    ``make_array_from_callback``.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def shard_env_state(mesh: Mesh, env_state: Any, num_envs: int) -> Any:
    """Shard exactly the per-env leaves of the env-state pytree.

    A leaf is sharded over the ``env`` axis iff its leading dim equals
    ``num_envs`` (the explicit batch annotation); every other leaf —
    including decoys whose first dim merely happens to be divisible by the
    device count, e.g. a per-prop table — is replicated.
    """
    if num_envs % mesh.size != 0:
        raise ValueError(
            f"num_envs {num_envs} not divisible by mesh size {mesh.size}")
    sh = env_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        batched = getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_envs
        return _put(x, sh if batched else rep)

    return jax.tree_util.tree_map(place, env_state)


def replicate_state(mesh: Mesh, state: Any) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _put(x, rep), state)
