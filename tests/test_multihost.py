"""Multi-host smoke test: two `jax.distributed` CPU processes.

Exercises the one code path that differs between "8 chips" and "a pod"
(run.py --multi_host → jax.distributed.initialize → global mesh spanning
processes), end to end through a real (tiny) AMP training run. This is the
CPU stand-in for a TPU pod: 2 processes × 4 virtual devices = an 8-device
global mesh, gradient/stat collectives crossing the process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLIP = os.path.join(
    REPO, "data", "motions", "reallusion_sword_shield",
    "RL_Avatar_Idle_Ready_Motion.npy")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_run_multi_host_two_processes(tmp_path):
    # tiny train cfg derived from the shipped AMP config
    with open(os.path.join(REPO, "data/cfg/train/rlg/amp_humanoid.yaml")) as f:
        tcfg = yaml.safe_load(f)
    c = tcfg["params"]["config"]
    c.update({
        "horizon_length": 4, "minibatch_size": 128, "mini_epochs": 1,
        "amp_batch_size": 64, "amp_minibatch_size": 128,
        "amp_obs_demo_buffer_size": 256, "amp_replay_buffer_size": 256,
        "save_frequency": 0,
    })
    # tiny networks: the production widths compile for minutes on the CPU
    # backend, and multi-minute compile skew between the two single-core
    # processes overruns the hardcoded 30 s Gloo context-init timeout
    tcfg["params"]["network"]["mlp"]["units"] = [32, 32]
    tcfg["params"]["network"]["disc"]["units"] = [32]
    cfg_path = tmp_path / "amp_tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(tcfg))

    port = _free_port()
    outdir = tmp_path / "out"
    procs = []
    logs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "PYTHONPATH": "",  # drop the axon sitecustomize
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(rank),
            # NO persistent compile cache for this test. Measured across 7
            # runs: every run where both ranks compiled fresh passed (the
            # multi-second compile gaps act as barriers that keep the two
            # processes' Gloo context-id assignment in lockstep); every
            # cache-hit run failed with Gloo context-init DEADLINE_EXCEEDED
            # / TCP connect timeouts — the cache-served executables start
            # executing asynchronously right after startup and the ranks
            # rendezvous on mismatched context keys within Gloo's hard 30 s
            # init deadline. Fresh compiles cost ~4 min/rank on this box and
            # make the test deterministic.
            "JAX_COMPILATION_CACHE_DIR": "",
        })
        log = open(tmp_path / f"rank{rank}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "ase_tpu.run",
             "--multi_host", "--rl_device", "cpu", "--bench",
             "--task", "HumanoidAMP",
             "--cfg_env", "humanoid_sword_shield.yaml",
             "--cfg_train", str(cfg_path),
             "--motion_file", CLIP,
             "--num_envs", "64", "--max_iterations", "2", "--seed", "11",
             "--output_path", str(outdir)],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
        ))
    try:
        for p in procs:
            assert p.wait(timeout=1500) == 0
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    text = [
        (tmp_path / f"rank{r}.log").read_text() for r in range(2)
    ]
    for r in range(2):
        assert f"multi-host: process {r}/2" in text[r], text[r][-2000:]
        assert "4 local / 8 global devices" in text[r], text[r][-2000:]
        assert "epoch 1 " in text[r]
        assert "training done" in text[r]
    # only process 0 writes the checkpoint (reference rank-0 saving)
    assert (outdir / "Humanoid.ckpt.npz").exists()


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
