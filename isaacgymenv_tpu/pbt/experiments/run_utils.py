"""Shared helpers for experiment definitions (ref: pbt/experiments/run_utils.py)."""

version = "v1"


def seeds(n: int):
    """Distinct seeds for multi-seed sweeps (ref run_utils.seeds)."""
    return [3 * (i + 42) for i in range(n)]

default_num_frames = 10_000_000_000
