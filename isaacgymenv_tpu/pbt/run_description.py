"""Experiment grid/launch descriptions for multi-run sweeps and PBT.

Port of the reference's pbt/launcher/run_description.py (ParamGenerator
:9, ParamList :18, ParamGrid :35, Experiment :87, RunDescription :141) —
the experiment-generation layer is host tooling and carries over almost
unchanged; only the process backends differ (TPU hosts / Slurm instead of
per-GPU process packing).
"""

from __future__ import annotations

import itertools
import random
from collections import OrderedDict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple


class ParamGenerator:
    def generate_params(self, randomize: bool = True):
        raise NotImplementedError


class ParamList(ParamGenerator):
    """A plain list of parameter combinations (ref :18)."""

    def __init__(self, combinations: Sequence[Dict]):
        self.combinations = list(combinations)

    def generate_params(self, randomize: bool = True):
        combos = list(self.combinations)
        if randomize:
            random.shuffle(combos)
        yield from combos


class ParamGrid(ParamGenerator):
    """Cartesian grid over (name, values) tuples (ref :35)."""

    def __init__(self, grid_tuples: Sequence[Tuple[str, Sequence]]):
        self.grid = OrderedDict(grid_tuples)

    def generate_params(self, randomize: bool = False):
        names = list(self.grid.keys())
        combos = [
            dict(zip(names, values))
            for values in itertools.product(*(self.grid[n] for n in names))
        ]
        if randomize:
            random.shuffle(combos)
        yield from combos


def _param_str(params: Dict) -> str:
    return "_".join(f"{k.split('.')[-1]}_{v}" for k, v in params.items())


class Experiment:
    """One base command + a parameter generator (ref :87)."""

    def __init__(
        self,
        name: str,
        cmd: str,
        param_generator: Iterable[Dict] = (),
        env_vars: Optional[Dict[str, str]] = None,
    ):
        self.name = name
        self.cmd = cmd
        self.params = (
            list(param_generator.generate_params(randomize=False))
            if isinstance(param_generator, ParamGenerator)
            else list(param_generator)
        )
        self.env_vars = env_vars or {}

    def generate_experiments(self):
        """Yield (full_cmd, experiment_name) per parameter combination
        (ref :98 — hydra-style key=value args appended to the base cmd)."""
        if not self.params:
            yield self.cmd, self.name
            return
        for params in self.params:
            args = " ".join(f"{k}={v}" for k, v in params.items())
            name = self.name if len(self.params) == 1 else f"{self.name}_{_param_str(params)}"
            yield f"{self.cmd} {args} experiment={name}", name


class RunDescription:
    """A named collection of experiments (ref :141)."""

    def __init__(self, run_name: str, experiments: Sequence[Experiment]):
        self.run_name = run_name
        self.experiments = list(experiments)

    def generate_experiments(self) -> List[Tuple[str, str, Dict[str, str]]]:
        out = []
        for e in self.experiments:
            for cmd, name in e.generate_experiments():
                out.append((cmd, f"{self.run_name}_{name}", e.env_vars))
        return out
