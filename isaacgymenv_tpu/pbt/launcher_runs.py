"""Launch a RUN_DESCRIPTION experiment module locally.

The reference's launcher entry (`python -m isaacgymenvs.pbt.launcher.run
--run=<module> --backend=processes`, ref: pbt/launcher/run.py:50) adapted to
one-TPU-host process packing; Slurm users should point launcher_slurm at the
same module.

    python -m isaacgymenv_tpu.pbt.launcher_runs \
        --run isaacgymenv_tpu.pbt.experiments.ant_pbt [--max_parallel 4] [--dry]
"""

from __future__ import annotations

import argparse
import importlib
import os
import shlex
import subprocess


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="module exporting RUN_DESCRIPTION")
    ap.add_argument("--max_parallel", type=int, default=4)
    ap.add_argument("--dry", action="store_true", help="print commands only")
    args = ap.parse_args(argv)

    mod = importlib.import_module(args.run)
    rd = mod.RUN_DESCRIPTION
    cmds = rd.generate_experiments()
    print(f"run {rd.run_name}: {len(cmds)} experiment(s)")
    procs = []
    for cmd, name, env_vars in cmds:
        print("launching:", cmd, flush=True)
        if args.dry:
            continue
        env = dict(os.environ, **env_vars)
        procs.append(subprocess.Popen(shlex.split(cmd), env=env))
        while sum(p.poll() is None for p in procs) >= args.max_parallel:
            procs[0].wait()
    for p in procs:
        p.wait()


if __name__ == "__main__":
    main()
