"""Local PBT launcher: run N policy processes against a shared workspace.

Port of the reference's pbt/launcher/run_processes.py (least-busy scheduling
is unnecessary here: one TPU host runs the population sequentially-sharded
or the user launches one process per host against shared storage).

Usage:
    python -m isaacgymenv_tpu.pbt.launcher --num_policies 4 -- \
        task=Ant pbt=pbt_default pbt.workspace=/tmp/pbt max_iterations=100
"""

from __future__ import annotations

import argparse
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_policies", type=int, default=4)
    ap.add_argument("--max_parallel", type=int, default=4)
    ap.add_argument("rest", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    base = [a for a in args.rest if a != "--"]

    procs = []
    for idx in range(args.num_policies):
        cmd = (
            [sys.executable, "-m", "isaacgymenv_tpu.train"]
            + base
            + [
                f"pbt.policy_idx={idx}",
                f"pbt.num_policies={args.num_policies}",
                f"experiment=pbt_{idx:03d}",
            ]
        )
        print("launching:", " ".join(cmd), flush=True)
        procs.append(subprocess.Popen(cmd))
        while sum(p.poll() is None for p in procs) >= args.max_parallel:
            procs[0].wait()
    for p in procs:
        p.wait()


if __name__ == "__main__":
    main()
