"""Training CLI — `python -m isaacgymenv_tpu.train task=Cartpole ...`.

Mirrors the reference entry point (ref: train.py:86-221; README.md:55-144):
hydra-style `key=value` overrides, `task=<T>` selects cfg/task/<T>.yaml +
cfg/train/<T>PPO.yaml, `test=True checkpoint=...` runs the player path,
`max_iterations=N` caps epochs, `num_envs=N` overrides the env count.
"""

from __future__ import annotations

import os
import sys
import time


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    kv = dict(a.split("=", 1) for a in argv if "=" in a)

    task = kv.pop("task", "Cartpole")
    seed = int(kv.pop("seed", 42))
    test = kv.pop("test", "False").lower() in ("true", "1")
    checkpoint = kv.pop("checkpoint", "")
    max_iterations = kv.pop("max_iterations", "")
    num_envs = kv.pop("num_envs", "")
    experiment = kv.pop("experiment", task)
    headless = kv.pop("headless", "True")  # accepted for CLI parity; no viewer
    train_name = kv.pop("train", "")
    pbt_name = kv.pop("pbt", "")
    kv.pop("pbt_restart", None)  # marker set by PBT self-restart

    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.learning.checkpoint import load_train_state, save_train_state
    from isaacgymenv_tpu.learning.ppo import PPO
    from isaacgymenv_tpu.utils.config import (
        apply_cli_overrides,
        load_task_config,
        load_train_config,
    )

    task_cfg = load_task_config(task)
    train_cfg = load_train_config(task, train_name or None)
    # route remaining dotted overrides: 'train.*' to train cfg, rest to task cfg
    task_overrides = [
        f"{k}={v}" for k, v in kv.items()
        if not k.startswith("train.") and not k.startswith("pbt.")
    ]
    train_overrides = [f"{k[6:]}={v}" for k, v in kv.items() if k.startswith("train.")]
    apply_cli_overrides(task_cfg, task_overrides)
    apply_cli_overrides(train_cfg, train_overrides)

    # PBT config: cfg/pbt/<name>.yaml + pbt.* CLI overrides (ref: cfg/config.yaml
    # defaults group `pbt: no_pbt`, pbt/pbt.py)
    pbt_cfg = {}
    if pbt_name:
        from isaacgymenv_tpu.utils.config import CFG_ROOT, load_yaml

        pbt_cfg = load_yaml(os.path.join(CFG_ROOT, "pbt", f"{pbt_name}.yaml"))
    pbt_overrides = [f"{k[4:]}={v}" for k, v in kv.items() if k.startswith("pbt.")]
    apply_cli_overrides(pbt_cfg, pbt_overrides)
    if num_envs:
        task_cfg["env"]["numEnvs"] = int(num_envs)

    env_cls = registry.get_task(task)
    env = env_cls(task_cfg)
    algo = train_cfg["params"].get("algo", {}).get("name", "a2c_continuous")
    if algo == "amp_continuous":
        from isaacgymenv_tpu.learning.amp import AMPPPO

        agent = AMPPPO(env, train_cfg)
    elif "rnn" in train_cfg["params"].get("network", {}):
        from isaacgymenv_tpu.learning.ppo_lstm import LSTMPPO

        agent = LSTMPPO(env, train_cfg)
    elif algo == "sac":
        from isaacgymenv_tpu.learning.sac import SAC

        agent = SAC(env, train_cfg)
    else:
        agent = PPO(env, train_cfg)

    run_dir = os.path.join("runs", experiment)
    os.makedirs(os.path.join(run_dir, "nn"), exist_ok=True)

    if test:
        import jax.numpy as jnp
        import numpy as np

        ts = load_train_state(agent, checkpoint)
        venv = env.as_vec_env(seed=seed)
        obs = venv.reset()
        total, count = 0.0, 0
        for _ in range(int(max_iterations) if max_iterations else 300):
            act = agent.act(ts, obs["obs"])
            obs, rew, done, extras = venv.step(act)
            total += float(rew.sum())
            count += env.num_envs
        print(f"av reward per step: {total / max(count,1):.3f}")
        return

    epochs = int(max_iterations) if max_iterations else None
    t0 = time.time()

    init_ts = None
    if checkpoint:
        init_ts = load_train_state(agent, checkpoint)

    # observers: TensorBoard/CSV summaries + optional W&B (ref §5.5;
    # replaces the reference's RLGPUAlgoObserver + missing wandb_utils)
    from isaacgymenv_tpu.utils.observers import (
        MultiObserver,
        TensorBoardObserver,
        WandbObserver,
    )

    wandb_cfg = {k: v for k, v in kv.items() if k.startswith("wandb")}
    wandb_cfg["wandb_activate"] = kv.get("wandb_activate", "False").lower() in ("true", "1")
    observer = MultiObserver(
        TensorBoardObserver(run_dir),
        WandbObserver({**wandb_cfg, "task": task}, rank=0),
    )
    steps_per_epoch_obs = (
        agent.cfg.horizon_length if algo != "sac" else agent.steps_per_epoch
    ) * env.num_envs
    import jax

    # one bulk device->host transfer per epoch: per-scalar float() in the
    # observers would otherwise issue a blocking sync PER METRIC (tens of
    # tunnel round-trips per epoch; measured ~3x fps_total)
    obs_callback = lambda ep, ts, info: observer.after_epoch(
        ep, (ep + 1) * steps_per_epoch_obs, jax.device_get(info)
    )

    callback = obs_callback
    if pbt_cfg.get("enabled"):
        from isaacgymenv_tpu.pbt.pbt import PbtObserver, PbtParams

        pbt_params = PbtParams(pbt_cfg, train_cfg)
        pbt_observer = PbtObserver(pbt_params, steps_per_epoch_obs)

        def callback(ep, ts, info):
            obs_callback(ep, ts, info)
            obj = float(
                info.get("true_objective", info.get("mean_return", 0.0))
            )
            pbt_observer.after_epoch(ep, obj, lambda p: save_train_state(ts, p))

    ts = agent.train(seed=seed, max_epochs=epochs, callback=callback, init_ts=init_ts)
    path = os.path.join(run_dir, "nn", f"{experiment}.ckpt")
    save_train_state(ts, path)
    per_epoch = (
        agent.cfg.horizon_length if algo != "sac" else agent.steps_per_epoch
    ) * env.num_envs
    steps = per_epoch * int(ts.epoch)
    dt = time.time() - t0
    print(f"saved {path}; {steps:,} env steps in {dt:.1f}s ({steps/dt:,.0f} steps/s)")


if __name__ == "__main__":
    main()
