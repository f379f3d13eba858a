"""SAC learner test: split collect/update jits run and learn on Cartpole."""

import numpy as np

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.learning.sac import SAC
from isaacgymenv_tpu.utils.config import load_task_config, load_train_config


def test_sac_learns_cartpole():
    cfg = load_task_config("Cartpole", num_envs=64)
    tcfg = load_train_config("Ant", name="AntSAC")
    c = tcfg["params"]["config"]
    c["batch_size"] = 256
    c["num_warmup_steps"] = 2
    c["replay_buffer_size"] = 20000
    c["num_steps_per_episode"] = 8

    env = registry.get_task("Cartpole")(cfg)
    agent = SAC(env, tcfg)
    ts = agent.init(0)
    first = None
    for ep in range(120):
        ts, info = agent.train_epoch(ts)
        if ep == 20:
            first = float(ts.mean_return)
    last = float(ts.mean_return)
    assert np.isfinite(float(info["c_loss"]))
    assert last > first, f"no SAC improvement: {first} -> {last}"
    # absolute learning bar (like test_ppo's >15): Cartpole returns reach
    # well above this within 120 epochs when SAC actually learns
    assert last > 10.0, f"SAC should reach return > 10 on Cartpole, got {last}"
