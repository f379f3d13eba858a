"""Slurm launcher: sbatch one job per experiment with timeout-requeue.

Port of the reference's pbt/launcher/run_slurm.py (+ slurm/sbatch_timeout.sh
resubmit-on-timeout wrapper) re-targeted at TPU allocations: instead of
`--gres=gpu:N` the generated script requests whole nodes of a TPU partition
and relies on `jax.distributed.initialize()` inside the training process
for multi-host meshes (SURVEY.md §5.8).

The launcher only *writes and submits* sbatch scripts — with
--print_only it is a pure generator, so it is testable without a cluster.

Usage:
    python -m isaacgymenv_tpu.pbt.launcher_slurm \
        --workdir /tmp/slurm_pbt --partition tpu --timeout 4:00:00 \
        --num_policies 8 -- task=Ant pbt=pbt_default pbt.workspace=/shared/pbt
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --output={workdir}/{name}.out
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task={cpus}
{partition_line}{timeout_line}#SBATCH --signal=B:USR1@90
#SBATCH --requeue

# resubmit-on-timeout (ref: pbt/launcher/slurm/sbatch_timeout.sh): Slurm
# sends USR1 90s before the time limit; requeue so the run resumes from the
# latest checkpoint (checkpoint= restore is automatic for PBT runs).
trap 'echo "timeout -> requeue"; scontrol requeue $SLURM_JOB_ID' USR1

{env_exports}
srun {cmd}
wait
"""


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--partition", default=None)
    ap.add_argument("--nodes", type=int, default=1, help="TPU hosts per job")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--timeout", default="0", help="Slurm time limit (0 = none)")
    ap.add_argument("--num_policies", type=int, default=0,
                    help=">0: generate a PBT population (one job per policy)")
    ap.add_argument("--print_only", action="store_true")
    ap.add_argument("rest", nargs=argparse.REMAINDER)
    return ap.parse_args(argv)


def build_scripts(args):
    base = " ".join(a for a in args.rest if a != "--")
    cmd0 = f"{sys.executable} -m isaacgymenv_tpu.train {base}"
    jobs = []
    if args.num_policies > 0:
        for idx in range(args.num_policies):
            cmd = (
                f"{cmd0} pbt.policy_idx={idx} "
                f"pbt.num_policies={args.num_policies} experiment=pbt_{idx:03d}"
            )
            jobs.append((f"pbt_{idx:03d}", cmd))
    else:
        jobs.append(("train", cmd0))

    scripts = []
    for name, cmd in jobs:
        script = SBATCH_TEMPLATE.format(
            name=name,
            workdir=args.workdir,
            nodes=args.nodes,
            cpus=args.cpus,
            partition_line=(
                f"#SBATCH --partition={args.partition}\n" if args.partition else ""
            ),
            timeout_line=(
                f"#SBATCH --time={args.timeout}\n" if args.timeout != "0" else ""
            ),
            env_exports="",
            cmd=cmd,
        )
        scripts.append((name, script))
    return scripts


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)
    for name, script in build_scripts(args):
        path = os.path.join(args.workdir, f"{name}.sbatch")
        with open(path, "w") as f:
            f.write(script)
        if args.print_only:
            print(f"--- {path} ---\n{script}")
        else:
            subprocess.check_call(["sbatch", path])
            print(f"submitted {path}")


if __name__ == "__main__":
    main()
