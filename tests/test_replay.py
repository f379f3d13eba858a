"""Replay visualizer: record rollout -> npz -> GIF (scripts/replay.py —
the host-side stand-in for the reference viewer, vec_task.py:270-512)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_record_and_render(tmp_path):
    npz = os.path.join(tmp_path, "cp.npz")
    gif = os.path.join(tmp_path, "cp.gif")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "replay.py"), "record",
         "task=Cartpole", "steps=12", "num_envs=2", f"out={npz}",
         "actions=random"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    d = np.load(npz, allow_pickle=True)
    assert d["body_pos"].shape[0] == 12
    assert d["body_pos"].shape[1] == len(d["parent"])
    assert np.isfinite(d["body_pos"]).all()

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "replay.py"), "render",
         npz, f"out={gif}", "stride=4"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(gif) > 1000
