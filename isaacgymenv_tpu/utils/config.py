"""YAML config system: task/train split + dotted CLI overrides.

Mirrors the reference's Hydra layout (SURVEY.md §5.6) — `cfg/task/<T>.yaml`
and `cfg/train/<T>PPO.yaml`, same key names — without the OmegaConf
dependency: interpolations are resolved by the loader (num_envs/seed
overrides), and CLI `a.b.c=value` overrides apply to any leaf.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

CFG_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cfg")


def _parse_value(v: str) -> Any:
    try:
        out = yaml.safe_load(v)
    except yaml.YAMLError:
        return v
    if isinstance(out, str):
        # YAML 1.1 reads "3e-4" (no dot) as a STRING; hydra/python accept it
        # as a float — so do we (PBT mutation math needs real numbers)
        try:
            return float(out)
        except ValueError:
            return out
    return out


def set_dotted(cfg: Dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    d = cfg
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


def get_dotted(cfg: Dict, dotted: str, default=None):
    d = cfg
    for k in dotted.split("."):
        if not isinstance(d, dict) or k not in d:
            return default
        d = d[k]
    return d


def deep_update(base: Dict, override: Dict) -> Dict:
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_yaml(path: str) -> Dict:
    """Load a yaml config, resolving hydra-style `defaults:` inheritance.

    A top-level `defaults: [Base, _self_]` list merges cfg/<dir>/Base.yaml
    (recursively resolved) under the file's own keys — the thin variant
    files mirror the reference's (e.g. ref cfg/task/AllegroHandFF.yaml,
    cfg/train/ShadowHandOpenAI_FFPPO.yaml)."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    defaults = cfg.pop("defaults", None)
    if defaults:
        base: Dict = {}
        for d in defaults:
            if d == "_self_":
                continue
            deep_update(
                base, load_yaml(os.path.join(os.path.dirname(path), f"{d}.yaml"))
            )
        cfg = deep_update(base, cfg)
    return cfg


def load_task_config(
    task: str,
    cfg_override: Optional[Dict] = None,
    num_envs: Optional[int] = None,
    **overrides: Any,
) -> Dict:
    """Load cfg/task/<task>.yaml with overrides applied."""
    path = os.path.join(CFG_ROOT, "task", f"{task}.yaml")
    cfg = load_yaml(path)
    if cfg_override:
        deep_update(cfg, copy.deepcopy(cfg_override))
    if num_envs is not None:
        cfg["env"]["numEnvs"] = int(num_envs)
    for k, v in overrides.items():
        set_dotted(cfg, k, v)
    return cfg


def load_train_config(task: str, name: Optional[str] = None) -> Dict:
    """Load cfg/train/<task>PPO.yaml (the `${task}PPO` convention,
    ref: cfg/config.yaml:61-65)."""
    name = name or f"{task}PPO"
    path = os.path.join(CFG_ROOT, "train", f"{name}.yaml")
    return load_yaml(path)


def apply_cli_overrides(cfg: Dict, argv) -> Dict:
    """hydra-style `key.path=value` overrides (`++` prefixes tolerated)."""
    for arg in argv:
        if "=" not in arg:
            continue
        k, v = arg.split("=", 1)
        k = k.lstrip("+")
        set_dotted(cfg, k, _parse_value(v))
    return cfg


def asset_root() -> str:
    """Robot asset directory.  Defaults to the VENDORED copy shipped with
    the repo (<repo>/assets — URDF/MJCF robots, meshes, AMP mocap `.npy`s);
    override with ISAACGYMENV_TPU_ASSET_ROOT.  The framework is standalone:
    nothing outside the repo is required at runtime."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.environ.get(
        "ISAACGYMENV_TPU_ASSET_ROOT", os.path.join(here, "assets")
    )
