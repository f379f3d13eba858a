"""Decentralized population-based training over a shared filesystem.

Behavioral port of the reference's PbtAlgoObserver (ref: pbt/pbt.py):
- each policy is an independent train process; every `interval_steps` env
  frames it saves `{iteration:06d}.yaml` (hyperparams + true_objective +
  frames) and `{iteration:06d}.ckpt` to `<workspace>/<policy_idx>/`
  (ref :505-526), then scans the other policies' latest checkpoints
  (ref :530-562).
- policies are ranked by true_objective; a policy in the bottom
  `replace_fraction_worst` loads weights from a random top policy when the
  objective gap exceeds both a std-based and an absolute threshold
  (ref :375-456), mutates its hyperparameters (pbt/mutation.py), and
  restarts itself via os.execv with a rewritten CLI (ref :123-177).
- orchestration stays filesystem-based (works on NFS/GCS-fuse) — the same
  decentralized single-failure-tolerant design as the reference
  (docs/pbt.md:28-31).
"""

from __future__ import annotations

import math
import os
import random
import sys
import time
from typing import Dict, Optional

import yaml

from isaacgymenv_tpu.pbt.mutation import mutate

_UNINITIALIZED = -1e9


def _ckpt_name(iteration: int) -> str:
    return f"{iteration:06d}.yaml"


def _model_name(iteration: int) -> str:
    return f"{iteration:06d}.ckpt"


class PbtParams:
    def __init__(self, pbt_cfg: Dict, train_cfg: Dict, task_cfg: Optional[Dict] = None):
        self.enabled = bool(pbt_cfg.get("enabled", False))
        self.policy_idx = int(pbt_cfg.get("policy_idx", 0))
        self.num_policies = int(pbt_cfg.get("num_policies", 8))
        self.workspace = str(pbt_cfg.get("workspace", "pbt_workspace"))
        self.interval_steps = int(pbt_cfg.get("interval_steps", 10_000_000))
        self.start_after_steps = int(pbt_cfg.get("start_after", 10_000_000))
        self.initial_delay_steps = int(pbt_cfg.get("initial_delay", 20_000_000))
        self.replace_fraction_best = float(pbt_cfg.get("replace_fraction_best", 0.3))
        self.replace_fraction_worst = float(pbt_cfg.get("replace_fraction_worst", 0.125))
        self.replace_threshold_frac_std = float(pbt_cfg.get("replace_threshold_frac_std", 0.5))
        self.replace_threshold_frac_absolute = float(pbt_cfg.get("replace_threshold_frac_absolute", 0.05))
        self.mutation_rate = float(pbt_cfg.get("mutation_rate", 0.15))
        self.change_min = float(pbt_cfg.get("change_min", 1.1))
        self.change_max = float(pbt_cfg.get("change_max", 1.5))
        self.dbg_mode = bool(pbt_cfg.get("dbg_mode", False))
        # mutation spec: {dotted param: mutation func name}.  Keys use full
        # CLI paths like the reference mutation yamls ("train.params.config.
        # gamma", "task.env.headingWeight" — cfg/pbt/mutation/*.yaml); bare
        # "config.*" keys are accepted as train.params-relative legacy.
        self.mutations: Dict[str, str] = dict(pbt_cfg.get("mutation", {}))
        self.mutable_params = {}
        for dotted in self.mutations:
            if dotted.startswith("train."):
                node, path = train_cfg, dotted[len("train."):]
            elif dotted.startswith("task."):
                if task_cfg is None:
                    raise ValueError(f"mutation key {dotted!r} needs the task cfg")
                node, path = task_cfg, dotted[len("task."):]
            else:
                node, path = train_cfg["params"], dotted
            for k in path.split("."):
                node = node[k]
            self.mutable_params[dotted] = node


def initial_pbt_check(argv) -> bool:
    """True when this process is a PBT self-restart (++pbt_restart=True);
    the restart CLI already carries checkpoint= and mutated params
    (ref: pbt/pbt.py:180-198)."""
    return any(a.lstrip("+").startswith("pbt_restart=") for a in argv)


def restart_with_new_params(
    policy_idx: int, new_params: Dict, restart_checkpoint: Optional[str]
) -> None:
    """os.execv self-restart with a rewritten CLI (ref: pbt/pbt.py:123-177)."""
    # filter by the keys AS EMITTED below, so repeated restarts replace the
    # previous mutation args instead of accumulating duplicates
    emitted = {
        p if p.startswith(("train.", "task.")) else f"train.params.{p}"
        for p in new_params
    }
    modified = []
    for arg in sys.argv[1:]:
        if "=" not in arg:
            modified.append(arg)
            continue
        name = arg.split("=", 1)[0].lstrip("+")
        if name in emitted or name in ("checkpoint", "pbt_restart"):
            continue
        modified.append(arg)
    modified.append("++pbt_restart=True")
    if restart_checkpoint:
        modified.append(f"checkpoint={restart_checkpoint}")
    for param, value in new_params.items():
        # full-path keys (train.*/task.*) route through the CLI override
        # machinery directly; legacy bare keys are train.params-relative
        if param.startswith(("train.", "task.")):
            modified.append(f"{param}={value}")
        else:
            modified.append(f"train.params.{param}={value}")
    print(f"Policy {policy_idx}: restarting self with args {modified}", flush=True)
    os.execv(sys.executable, [sys.executable, "-m", "isaacgymenv_tpu.train"] + modified)


class PbtObserver:
    """Train-loop callback: call `after_epoch(epoch, ts, info, save_fn)`
    every epoch.  save_fn(path) must write the current train state."""

    def __init__(self, params: PbtParams, steps_per_epoch: int):
        self.p = params
        self.steps_per_epoch = steps_per_epoch
        self.pbt_iteration = -1
        self.initial_env_frames = 0
        self.experiment_start = time.time()
        self.curr_objective = _UNINITIALIZED
        self.workspace_dir = os.path.abspath(self.p.workspace)
        self.own_dir = os.path.join(self.workspace_dir, f"{self.p.policy_idx:03d}")
        os.makedirs(self.own_dir, exist_ok=True)

    # -- helpers -----------------------------------------------------------
    def _policy_dir(self, idx: int) -> str:
        return os.path.join(self.workspace_dir, f"{idx:03d}")

    def _save_checkpoint(self, iteration: int, env_frames: int, save_fn):
        ckpt = {
            "iteration": iteration,
            "true_objective": float(self.curr_objective),
            "env_frames": int(env_frames),
            "params": self.p.mutable_params,
        }
        tmp = os.path.join(self.own_dir, ".tmp.yaml")
        with open(tmp, "w") as f:
            yaml.safe_dump(ckpt, f)
        os.replace(tmp, os.path.join(self.own_dir, _ckpt_name(iteration)))
        save_fn(os.path.join(self.own_dir, _model_name(iteration)))

    def _load_population(self):
        """Latest {yaml, ckpt} pair per policy (ref: :530-562)."""
        out = {}
        for idx in range(self.p.num_policies):
            d = self._policy_dir(idx)
            out[idx] = None
            if not os.path.isdir(d):
                continue
            yamls = sorted(f for f in os.listdir(d) if f.endswith(".yaml") and not f.startswith("."))
            for y in reversed(yamls):
                model = os.path.join(d, y.replace(".yaml", ".ckpt"))
                if not os.path.exists(model):
                    continue
                try:
                    with open(os.path.join(d, y)) as f:
                        meta = yaml.safe_load(f)
                    meta["checkpoint"] = model
                    out[idx] = meta
                    break
                except Exception:
                    continue
        return out

    # -- main hook ----------------------------------------------------------
    def after_epoch(self, epoch: int, objective: float, save_fn) -> None:
        """objective: latest true_objective (or mean episode return)."""
        self.curr_objective = float(objective)
        env_frames = (epoch + 1) * self.steps_per_epoch
        if self.pbt_iteration == -1:
            self.pbt_iteration = env_frames // self.p.interval_steps
            self.initial_env_frames = env_frames
        iteration = env_frames // self.p.interval_steps
        if iteration <= self.pbt_iteration:
            return
        start_delay = 0 if self.p.dbg_mode else 30
        if time.time() - self.experiment_start < start_delay:
            return
        self.pbt_iteration = iteration

        try:
            self._save_checkpoint(iteration, env_frames, save_fn)
            checkpoints = self._load_population()
        except Exception as exc:  # fs flakiness: skip an iteration (ref :311-326)
            print(f"Policy {self.p.policy_idx}: PBT exception {exc}")
            return

        objectives = [
            checkpoints[i]["true_objective"] if checkpoints[i] else _UNINITIALIZED
            for i in range(self.p.num_policies)
        ]
        order = sorted(range(self.p.num_policies), key=lambda i: -objectives[i])
        objectives_filtered = [o for o in objectives if o > _UNINITIALIZED]

        if (
            env_frames - self.initial_env_frames < self.p.start_after_steps
            or env_frames < self.p.initial_delay_steps
        ) and not self.p.dbg_mode:
            return

        n_best = math.ceil(self.p.replace_fraction_best * self.p.num_policies)
        n_worst = math.ceil(self.p.replace_fraction_worst * self.p.num_policies)
        best_policies = order[:n_best]
        worst_policies = order[-n_worst:]
        if self.p.policy_idx not in worst_policies and not self.p.dbg_mode:
            return
        if len(objectives_filtered) <= max(2, self.p.num_policies // 2) and not self.p.dbg_mode:
            return

        candidate = random.choice(best_policies)
        cand = checkpoints[candidate]
        if cand is None:
            return
        delta = cand["true_objective"] - self.curr_objective

        import numpy as np

        n_out = int(math.floor(0.2 * len(objectives_filtered)))
        pool = sorted(objectives_filtered)[n_out:] if len(objectives_filtered) > n_out else objectives_filtered
        std = float(np.std(pool)) if pool else 0.0
        threshold = self.p.replace_threshold_frac_std * std
        abs_threshold = self.p.replace_threshold_frac_absolute * abs(cand["true_objective"])

        if (delta > threshold and delta > abs_threshold) or self.p.dbg_mode:
            new_params = mutate(
                cand.get("params", self.p.mutable_params),
                self.p.mutations,
                self.p.mutation_rate,
                self.p.change_min,
                self.p.change_max,
            )
            restart_with_new_params(
                self.p.policy_idx, new_params, cand["checkpoint"]
            )
