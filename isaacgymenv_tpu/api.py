"""Library entry point mirroring the reference's `isaacgymenvs.make`.

ref: isaacgymenvs/__init__.py:14-55 — creates a ready-to-step vectorized env
from a task name + overrides. Here the returned object is a `VecEnv` wrapper
(stateful convenience shell over the pure functional env; see envs/base.py).
"""

from __future__ import annotations

from typing import Any, Optional


def make(
    seed: int,
    task: str,
    num_envs: int,
    sim_device: str = "tpu",
    rl_device: str = "tpu",
    graphics_device_id: int = -1,
    headless: bool = True,
    cfg: Optional[dict] = None,
    **kwargs: Any,
):
    """Create a vectorized task env (stateful wrapper around the pure env).

    Unknown-device args are accepted for reference API compatibility; on TPU
    sim and RL always share the device so `sim_device`/`rl_device` are
    informational only.
    """
    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.utils.config import load_task_config

    task_cfg = load_task_config(task, cfg_override=cfg, num_envs=num_envs, **kwargs)
    # config-variant files select their env class via the cfg `name:` field
    # (ref: hydra cfg task.name -> isaacgym_task_map, e.g.
    # AllegroHandLSTM.yaml carries name: AllegroHand)
    env_cls = registry.get_task(task_cfg.get("name", task))
    env = env_cls(task_cfg)
    return env.as_vec_env(seed=seed)
