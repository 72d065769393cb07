"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

This is the TPU-land equivalent of multi-node testing (SURVEY §4): env state
sharded over the `env` mesh axis, train state replicated, the full jitted
train epoch compiled and executed across 8 devices.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ase_tpu.parallel import mesh as mesh_lib


def test_virtual_devices_present():
    assert jax.device_count() >= 8, jax.devices()


def test_mesh_psum():
    mesh = mesh_lib.make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.arange(16.0)
    x = jax.device_put(x, NamedSharding(mesh, P("env")))

    @jax.jit
    def f(x):
        return jnp.sum(x)

    assert float(f(x)) == float(np.arange(16).sum())


def test_sharded_train_epoch():
    """The dryrun_multichip path: full ASE epoch over an 8-device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_epoch_parity_1dev_vs_8dev():
    """A full AMP train epoch at realistic size (256 envs, horizon 16) gives
    the same metrics and parameters whether run on 1 device or sharded over
    the 8-device mesh: SPMD partitioning must be semantics-preserving (up to
    reduction reordering). minibatch == batch so the permutation order inside
    the update is irrelevant."""
    from ase_tpu.envs import parse_task
    from ase_tpu.learning.amp_agent import AMPAgent
    from tests.test_env import make_cfg
    from tests.test_learning import TRAIN_CFG

    cfg = make_cfg(numEnvs=256)
    tcfg = copy.deepcopy(TRAIN_CFG)
    c = tcfg["params"]["config"]
    c.update({
        "horizon_length": 16, "minibatch_size": 256 * 16, "mini_epochs": 1,
        "amp_batch_size": 256, "amp_minibatch_size": 256 * 16,
        "amp_obs_demo_buffer_size": 512, "amp_replay_buffer_size": 512,
    })

    env = parse_task("HumanoidAMP", cfg)
    agent = AMPAgent(env, tcfg)

    def run(mesh):
        ts = agent.init_train_state(jax.random.PRNGKey(0))
        env_state = env.initial_state(jax.random.PRNGKey(1))
        if mesh is not None:
            ts = mesh_lib.replicate_state(mesh, ts)
            env_state = mesh_lib.shard_env_state(mesh, env_state, env.num_envs)
        ts, env_state, metrics = agent.train_epoch(ts, env_state)
        return jax.device_get(ts), jax.device_get(metrics)

    ts1, m1 = run(None)
    agent._train_epoch_jit = None  # force re-jit with sharded inputs
    ts8, m8 = run(mesh_lib.make_mesh(8))

    for k in sorted(m1):
        if np.ndim(m1[k]) == 0:
            np.testing.assert_allclose(
                np.asarray(m1[k]), np.asarray(m8[k]), rtol=2e-3, atol=1e-4,
                err_msg=f"metric {k}",
            )
    # Adam normalizes each grad, so a float-reduction-reordering difference
    # of ~1e-7 in a near-zero grad can move a weight by up to ~lr per
    # minibatch step; compare with an absolute tolerance of a few lr
    # (lr=2e-4, 2 updates in this epoch).
    lr = float(c["learning_rate"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(ts1.params)[0],
        jax.tree_util.tree_flatten_with_path(ts8.params)[0],
    ):
        np.testing.assert_allclose(
            a, b, atol=5 * lr, err_msg=jax.tree_util.keystr(pa)
        )


def test_shard_env_state_explicit_batch_axis():
    """Only leaves whose leading dim == num_envs are sharded; a decoy leaf
    whose first dim merely divides the device count (e.g. a per-prop table
    with 8 rows) stays replicated (VERDICT r3 weak #5)."""
    mesh = mesh_lib.make_mesh(8)
    num_envs = 32
    state = {
        "per_env": jnp.zeros((num_envs, 7)),
        "decoy_divisible": jnp.zeros((8, 3)),       # divisible by ndev, not per-env
        "decoy_divisible2": jnp.zeros((16,)),       # divisible, wrong size
        "scalar": jnp.asarray(1.0),
    }
    out = mesh_lib.shard_env_state(mesh, state, num_envs)
    assert out["per_env"].sharding == mesh_lib.env_sharding(mesh)
    for k in ("decoy_divisible", "decoy_divisible2", "scalar"):
        assert out[k].sharding.is_fully_replicated, k
    with pytest.raises(ValueError):
        mesh_lib.shard_env_state(mesh, state, num_envs=30)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
