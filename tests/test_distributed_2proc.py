"""Two-process jax.distributed training smoke (the torchrun-multi-node
equivalent, ref: /root/reference/README.md:167-172).

Spawns two REAL processes through the `python -m isaacgymenv_tpu.train`
entry with the coordinator env-var triplet; each contributes one CPU device
to the global runtime, `multi_gpu=auto` shards the env axis over the
2-device global mesh, and both ranks must complete a short training run.
This exercises the only distributed branch that single-process tests
cannot: cross-process mesh formation + collectives through
jax.distributed.initialize() (train.py multi-host entry).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train(tmp_path):
    port = _free_port()
    procs = []
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(rank),
            ISAACGYMENV_TPU_NO_CACHE="1",
        )
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        # one CPU device per process -> 2 global devices
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "isaacgymenv_tpu.train",
                    "task=Cartpole", "headless=True", "multi_gpu=True",
                    "max_iterations=3", "num_envs=64",
                    "train.params.config.minibatch_size=512",
                    f"experiment=dist2p_rank{rank}",
                ],
                cwd=str(tmp_path),
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=850)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    # rank 0 must have seen the 2-device global mesh and finished an epoch
    assert "sharding 64 envs over 2 devices" in outs[0], outs[0][-2000:]
    assert "epoch" in outs[0]
