"""Training observers: TensorBoard/CSV metrics + optional Weights & Biases.

Replaces the reference's RLGPUAlgoObserver/MultiObserver (ref:
utils/rlgames_utils.py:130-239) and the W&B observer that train.py imports
from the MISSING utils/wandb_utils.py (a known reference bug, train.py:94 —
the fork deleted the module; we implement the equivalent).

- `TensorBoardObserver`: writes every scalar in the per-epoch info dict to
  runs/<exp>/summaries (torch.utils.tensorboard; CSV fallback when
  tensorboard isn't importable), including the env's `extras['episode']`
  per-term reward means which our envs return through the train info dict.
- `WandbObserver`: init-once (rank 0 only) W&B run mirroring the reference
  flags (wandb_project/group/name); silently disabled when the wandb
  package or credentials are absent.
- `MultiObserver`: fan-out.
"""

from __future__ import annotations

import csv
import os
from typing import Any, Dict, Optional


def _scalars(info: Dict[str, Any], prefix: str = "") -> Dict[str, float]:
    out = {}
    for k, v in info.items():
        if isinstance(v, dict):
            out.update(_scalars(v, f"{prefix}{k}/"))
            continue
        try:
            out[f"{prefix}{k}"] = float(v)
        except (TypeError, ValueError):
            try:
                import numpy as np

                arr = np.asarray(v)
                if arr.size == 1:
                    out[f"{prefix}{k}"] = float(arr)
            except Exception:
                pass
    return out


class TensorBoardObserver:
    def __init__(self, run_dir: str):
        self.dir = os.path.join(run_dir, "summaries")
        os.makedirs(self.dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(self.dir)
            self.csv = None
        except Exception:
            self.writer = None
            self.csv_path = os.path.join(self.dir, "metrics.csv")
            self.csv = open(self.csv_path, "a", newline="")
            self._csv_writer = csv.writer(self.csv)

    def after_epoch(self, epoch: int, frames: int, info: Dict[str, Any]) -> None:
        scalars = _scalars(info)
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(k, v, frames)
        else:
            for k, v in scalars.items():
                self._csv_writer.writerow([frames, k, v])
            self.csv.flush()

    def close(self):
        if self.writer is not None:
            self.writer.flush()


class WandbObserver:
    """Rank-0-only W&B logging (ref: train.py:181-186 + the missing
    wandb_utils; disabled gracefully without the package)."""

    def __init__(self, cfg: Dict[str, Any], rank: int = 0):
        self.run = None
        if rank != 0 or not cfg.get("wandb_activate", False):
            return
        try:
            import wandb

            self.run = wandb.init(
                project=cfg.get("wandb_project", "isaacgymenv_tpu"),
                group=cfg.get("wandb_group", ""),
                entity=cfg.get("wandb_entity", None) or None,
                name=cfg.get("wandb_name", None),
                config=cfg,
                resume=True,
            )
        except Exception as exc:  # no package / no credentials
            print(f"wandb disabled: {exc}")

    def after_epoch(self, epoch: int, frames: int, info: Dict[str, Any]) -> None:
        if self.run is None:
            return
        self.run.log(_scalars(info), step=frames)

    def close(self):
        if self.run is not None:
            self.run.finish()


class MultiObserver:
    """Fan-out (ref: rlgames_utils.py:212-239)."""

    def __init__(self, *observers):
        self.observers = [o for o in observers if o is not None]

    def after_epoch(self, epoch: int, frames: int, info: Dict[str, Any]) -> None:
        for o in self.observers:
            o.after_epoch(epoch, frames, info)

    def close(self):
        for o in self.observers:
            o.close()
