"""CLI entry point (reference ``ase/run.py``): same flags, same registries.

Examples (mirroring the reference README):

  python -m ase_tpu.run --task HumanoidAMP \
      --cfg_env humanoid_sword_shield.yaml \
      --cfg_train train/rlg/amp_humanoid.yaml \
      --motion_file <clip.npy>

  python -m ase_tpu.run --task HumanoidAMPGetup \
      --cfg_env humanoid_ase_sword_shield_getup.yaml \
      --cfg_train train/rlg/ase_humanoid.yaml \
      --motion_file <dataset.yaml>

  python -m ase_tpu.run --task HumanoidHeading \
      --cfg_env humanoid_sword_shield_heading.yaml \
      --cfg_train train/rlg/hrl_humanoid.yaml \
      --llc_checkpoint <llc.ckpt.npz> --motion_file <dataset.yaml>
"""

from __future__ import annotations

import os
import sys


def build_alg_runner():
    """Algo/player registries (reference run.py:153-170)."""
    from ase_tpu.learning.amp_agent import AMPAgent
    from ase_tpu.learning.ase_agent import ASEAgent
    from ase_tpu.learning.hrl_agent import HRLAgent
    from ase_tpu.learning.players import AMPPlayer, ASEPlayer, CommonPlayer, HRLPlayer

    algos = {"amp": AMPAgent, "ase": ASEAgent, "hrl": HRLAgent}
    players = {"amp": AMPPlayer, "ase": ASEPlayer, "hrl": HRLPlayer, "common": CommonPlayer}
    return algos, players


def main(argv=None):
    from ase_tpu.envs import parse_task
    from ase_tpu.utils import config as cfg_util

    args = cfg_util.get_args(argv)
    if args.rl_device == "cpu":
        # force the JAX host-CPU backend (the deployment may register a TPU
        # plugin that would otherwise take precedence)
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.multi_host:
        # Multi-host data parallelism: one process per host, all hosts join a
        # global mesh — the TPU-native replacement for the reference's MPI
        # rank setup (reference run.py:36-50). Must run before any device
        # access. On TPU pods the coordinator/topology is auto-detected from
        # the runtime environment; elsewhere (e.g. the CPU multi-process
        # smoke test) it comes from JAX_COORDINATOR_ADDRESS /
        # JAX_NUM_PROCESSES / JAX_PROCESS_ID.
        import jax
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()
        print(f"multi-host: process {jax.process_index()}/{jax.process_count()} "
              f"sees {jax.local_device_count()} local / {jax.device_count()} "
              f"global devices", flush=True)
        # boot barrier: run one tiny cross-process collective NOW, while all
        # processes are within seconds of each other. This establishes the
        # backend's communicator context (Gloo on CPU has a hard 30 s
        # context-init timeout that multi-minute compile skew would overrun)
        # and fails fast on topology/config mismatch before the long compiles.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ase_tpu:multi_host_boot")
    cfg, cfg_train = cfg_util.load_cfg(args)

    env = parse_task(args.task, cfg, headless=args.headless)

    algos, players = build_alg_runner()
    algo_name = cfg_train["params"]["algo"]["name"]
    agent_cls = algos[algo_name]
    agent = agent_cls(env, cfg_train, output_dir=args.output_path)

    if args.test:
        player_cls = players.get(algo_name, players["common"])
        player = player_cls(agent)
        player.restore(args.checkpoint)
        player.run(num_steps=cfg["env"]["episodeLength"],
                   video_path=args.save_video or None)
        return

    # multi-chip data parallelism (reference --horovod, run.py:36-50): shard
    # envs over every local device; XLA inserts the grad/stat all-reduces
    if args.horovod or args.multi_gpu or args.multi_host:
        agent.setup_mesh()

    writer = None
    if args.bench:
        # benchmark mode: pure training throughput — no TB writer, no saves
        agent.config["save_frequency"] = 0
        agent.save_frequency = 0
    else:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(
                args.logdir or os.path.join(args.output_path, "summaries"))
        except Exception:
            pass

    # training resume (reference config.py:97-104): --resume 1 --checkpoint <p>
    restore_path = None
    if args.resume and args.checkpoint not in ("", "Base"):
        restore_path = args.checkpoint

    agent.train(writer=writer, restore_path=restore_path)


if __name__ == "__main__":
    main()
