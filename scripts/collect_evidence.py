"""Turn runs/logs/*.log training stdout into committed CSV + a summary table.

Usage: python scripts/collect_evidence.py [--logs runs/logs --out docs/evidence]

Each train.py epoch line looks like
  epoch   120 | return    123.45 | len  480.2 | kl 0.0042 | lr 1.2e-03 | fps_total 534,123
(sac lines use 'sac epoch'); rows become (epoch, return, length, fps) CSVs
and a markdown table of final/best returns for README/docs.
"""

from __future__ import annotations

import argparse
import csv
import os
import re

LINE = re.compile(
    r"epoch\s+(\d+)\s*\|\s*return\s+([-\d.]+)\s*\|\s*len\s+([-\d.]+).*?"
    r"fps(?:_total)?\s+([\d,]+)"
)


def parse_log(path):
    rows = []
    with open(path, errors="replace") as f:
        for line in f:
            m = LINE.search(line)
            if m:
                rows.append(
                    (
                        int(m.group(1)),
                        float(m.group(2)),
                        float(m.group(3)),
                        int(m.group(4).replace(",", "")),
                    )
                )
    return rows


# task-quality TB channels worth surfacing per run (episode metrics written
# by the TensorBoardObserver; the in-env eval instrumentation the reference
# validates with — SURVEY.md §4)
_TB_CHANNELS = [
    "consecutive_successes",
    "episode/terrain_level",
    "episode/distance_walked",
    "disc_reward",
    "mean_length",
]


def tb_channels(run_dir: str) -> dict:
    """Last value of each interesting TB scalar for runs/<name>/summaries."""
    d = os.path.join(run_dir, "summaries")
    if not os.path.isdir(d):
        return {}
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except ImportError:
        return {}
    ea = EventAccumulator(d)
    ea.Reload()
    out = {}
    for tag in _TB_CHANNELS:
        if tag in ea.Tags()["scalars"]:
            ev = ea.Scalars(tag)
            out[tag] = (ev[0].value, max(e.value for e in ev), ev[-1].value)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", default="runs/logs")
    ap.add_argument("--runs", default=None, help="runs dir for TB summaries "
                    "(default: parent of --logs)")
    ap.add_argument("--out", default="docs/evidence")
    args = ap.parse_args()
    runs_dir = args.runs or os.path.dirname(os.path.abspath(args.logs))
    os.makedirs(args.out, exist_ok=True)
    summary = []
    for fn in sorted(os.listdir(args.logs)):
        if not fn.endswith(".log"):
            continue
        name = fn[:-4]
        rows = parse_log(os.path.join(args.logs, fn))
        if not rows:
            continue
        with open(os.path.join(args.out, f"{name}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["epoch", "mean_return", "mean_ep_length", "fps_total"])
            w.writerows(rows)
        best = max(r[1] for r in rows)
        chans = tb_channels(os.path.join(runs_dir, name))
        extra = "; ".join(
            f"{k.split('/')[-1]} {v[0]:.2f}→{v[2]:.2f} (best {v[1]:.2f})"
            for k, v in chans.items() if k != "mean_length"
        )
        summary.append(
            (name, rows[0][1], rows[-1][1], best, rows[-1][0], rows[-1][3],
             rows[-1][2], extra)
        )
    with open(os.path.join(args.out, "SUMMARY.md"), "w") as f:
        f.write("# Learning evidence (single TPU chip)\n\n")
        f.write("| run | first return | final return | best return | final ep len "
                "| epochs | fps_total | task metrics (first→last) |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        for name, first, final, best, ep, fps, eplen, extra in summary:
            f.write(
                f"| {name} | {first:.2f} | {final:.2f} | {best:.2f} | {eplen:.0f} "
                f"| {ep} | {fps:,} | {extra} |\n"
            )
    for s in summary:
        print(s)


if __name__ == "__main__":
    main()
