"""Short-horizon learning asserts for the flagship ladder (CI-runnable).

The reference's entire validation story is training curves
(docs/rl_examples.md); full-scale evidence lives in docs/evidence (real-TPU
runs from scripts/train_ladder.sh).  These tests are the CI bar: a few
minutes of CPU training must already show an unambiguous learning signal on
AnymalTerrain (survival time climbs: the robot stops falling) and ShadowHand
(in-hand cube control improves hold time).
"""

import numpy as np

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.learning.ppo import PPO
from isaacgymenv_tpu.utils.config import load_task_config, load_train_config


def _short(task, num_envs, horizon, epochs, train_name=None, task_tweaks=None):
    cfg = load_task_config(task, num_envs=num_envs)
    if task_tweaks:
        for k, v in task_tweaks.items():
            cfg["env"][k] = v
    env = registry.get_task(task)(cfg)
    tcfg = load_train_config(task, train_name)
    c = tcfg["params"]["config"]
    c.update(horizon_length=horizon, minibatch_size=num_envs * horizon // 2,
             mini_epochs=3)
    agent = PPO(env, tcfg)
    ts = agent.init(0)
    lens, rets = [], []
    for _ in range(epochs):
        ts, info = agent.train_epoch(ts)
        lens.append(float(info["mean_length"]))
        rets.append(float(info["mean_return"]))
    return lens, rets


def test_anymal_terrain_learns_to_survive():
    """Survival time on curriculum terrain climbs within a few epochs —
    random policies fall in ~20-60 steps; PD-tracking policies persist
    (ref docs/rl_examples.md:206-231 lineage)."""
    lens, rets = _short("AnymalTerrain", num_envs=64, horizon=24, epochs=12)
    early = np.mean(lens[2:5])
    late = np.mean(lens[-3:])
    assert late > early * 1.3 or late > 100.0, (
        f"no survival improvement on AnymalTerrain: {early:.1f} -> {late:.1f}"
    )
    assert np.isfinite(rets[-1])


def test_shadow_hand_learns_to_hold_cube():
    """ShadowHand's first learnable signal is NOT dropping the cube (episodes
    end on fall_dist): mean episode length must climb within ~20 short
    epochs.  The rot-reward itself needs far more experience (full-scale
    evidence: docs/evidence ShadowHand_r2 on real TPU)."""
    lens, rets = _short(
        "ShadowHand", num_envs=64, horizon=16, epochs=20,
        task_tweaks={"observationType": "full_state"},
    )
    early = np.mean(lens[2:6])
    late = np.mean(lens[-4:])
    assert late > early * 1.15, (
        f"cube-hold time not improving on ShadowHand: {early:.1f} -> {late:.1f}"
    )
    assert np.isfinite(rets[-1])
