"""Round-5 evidence: CSVs from runs/logs + task metrics from tensorboard.

Extends collect_evidence.py with the per-task curriculum/success channels
(terrain_level, consecutive_successes, lifted, disc_reward, ...) pulled
from each run's summaries/ events so the SUMMARY table carries the
task-metric story, not just returns.

Usage: python scripts/collect_r5_evidence.py [run names...]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTEREST = (
    "episode/terrain_level", "episode/distance_walked",
    "episode/consecutive_successes", "episode/successes", "episode/lifted",
    "episode/tolerance", "disc_reward", "episode/eef_err",
    "episode/heading_err", "true_objective", "episode/rew_lin_vel_xy",
)


def run_metrics(run_dir):
    from tensorboard.backend.event_processing import event_accumulator as ea

    files = sorted(glob.glob(os.path.join(run_dir, "summaries", "*")))
    if not files:
        return {}
    out = {}
    for f in files:
        acc = ea.EventAccumulator(f, size_guidance={"scalars": 0})
        acc.Reload()
        for tag in acc.Tags()["scalars"]:
            vals = acc.Scalars(tag)
            if not vals:
                continue
            prev = out.get(tag)
            rows = [(v.step, v.value) for v in vals]
            out[tag] = (prev or []) + rows
    summary = {}
    for tag, rows in out.items():
        if tag not in INTEREST and not tag.startswith("mean_"):
            continue
        rows.sort()
        lastk = [v for _, v in rows[-10:]]
        summary[tag] = {
            "first": rows[0][1],
            "final10": sum(lastk) / len(lastk),
            "max": max(v for _, v in rows),
        }
    return summary


def main():
    names = sys.argv[1:] or sorted(
        os.path.basename(p) for p in glob.glob("runs/*_r5*") if os.path.isdir(p)
    )
    for name in names:
        rd = os.path.join("runs", name)
        if not os.path.isdir(rd):
            continue
        m = run_metrics(rd)
        if not m:
            continue
        print(f"\n## {name}")
        for tag in sorted(m):
            s = m[tag]
            print(f"  {tag:36s} first={s['first']:10.3f} final10={s['final10']:10.3f} max={s['max']:10.3f}")


if __name__ == "__main__":
    main()
