"""Summarize a multi-process PBT demo run into committed markdown evidence.

Reads the launcher log (interleaved per-policy stdout) + the shared
workspace protocol files and reports, per policy: PBT iterations completed,
objective trajectory, and every replacement/mutation/self-restart event —
the full decentralized PBT cycle the reference implements via
pbt/pbt.py:123-177 (os.execv restart) and :505-526 (checkpoint protocol).

Usage: python scripts/collect_pbt_evidence.py \
           [--log runs/logs/pbt_demo/launcher.log] \
           [--workspace runs/pbt_demo_ws] [--out docs/evidence/pbt_demo.md]
"""

from __future__ import annotations

import argparse
import os
import re

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="runs/logs/pbt_demo/launcher.log")
    ap.add_argument("--workspace", default="runs/pbt_demo_ws")
    ap.add_argument("--out", default="docs/evidence/pbt_demo.md")
    args = ap.parse_args()

    restarts = []
    with open(args.log, errors="replace") as f:
        for line in f:
            m = re.search(r"Policy (\d+): restarting self with args (.*)", line)
            if m:
                restarts.append((int(m.group(1)), m.group(2)))

    lines = ["# PBT end-to-end demo (3 Cartpole policies, shared-FS protocol)", ""]
    lines.append(f"Self-restart (replacement + mutation) events: **{len(restarts)}**")
    lines.append("")
    for idx, cli in restarts:
        toks = [t.strip("[]',") for t in cli.split()]
        interesting = [
            t for t in toks
            if t.startswith(("checkpoint=", "train.params.config."))
        ]
        lines.append(
            f"- policy {idx} replaced its weights and mutated hyperparams: "
            f"`{' '.join(interesting)}`"
        )
    lines.append("")
    lines.append("| policy | PBT checkpoints | last objective | frames |")
    lines.append("|---|---|---|---|")
    for d in sorted(os.listdir(args.workspace)):
        pdir = os.path.join(args.workspace, d)
        if not os.path.isdir(pdir):
            continue
        yamls = sorted(f for f in os.listdir(pdir) if f.endswith(".yaml"))
        if not yamls:
            continue
        with open(os.path.join(pdir, yamls[-1])) as f:
            meta = yaml.safe_load(f)
        obj = meta.get("true_objective")
        frames = meta.get("env_frames")
        obj_s = f"{obj:.2f}" if isinstance(obj, (int, float)) else "?"
        frames_s = f"{frames:,}" if isinstance(frames, int) else "?"
        lines.append(f"| {d} | {len(yamls)} | {obj_s} | {frames_s} |")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
