"""Per-section timing of one PPO training epoch (rollout vs update).

The aggregate fps_total hides where time goes; this prints wall times for
the two jit programs separately (after a warmup/compile epoch) plus a
`jax.profiler` trace directory for xprof/tensorboard inspection.

Usage: python scripts/profile_train.py [task] [num_envs] [--trace]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.learning.ppo import PPO
from isaacgymenv_tpu.utils.config import load_task_config, load_train_config


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "Anymal"
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    do_trace = "--trace" in sys.argv

    cfg = load_task_config(task, num_envs=num_envs)
    tcfg = load_train_config(task)
    env = registry.get_task(task)(cfg)
    agent = PPO(env, tcfg)
    ts = agent.init(0)

    # warmup/compile
    ts, _ = agent.train_epoch(ts)
    jax.block_until_ready(ts.params)

    steps = agent.cfg.horizon_length * env.num_envs
    iters = 5
    t_roll = t_upd = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        ts, batch, advs, returns, env_metrics = agent._rollout_gae_jit(ts)
        jax.block_until_ready(advs)
        t1 = time.perf_counter()
        ts, info = agent._update_jit(ts, batch, advs, returns)
        jax.block_until_ready(info["loss"])
        t2 = time.perf_counter()
        t_roll += t1 - t0
        t_upd += t2 - t1
    t_roll /= iters
    t_upd /= iters
    print(f"{task} @ {num_envs} envs, {steps} steps/epoch")
    print(f"rollout+GAE: {t_roll*1e3:8.1f} ms  ({steps/t_roll:,.0f} steps/s)")
    print(f"update:      {t_upd*1e3:8.1f} ms")
    print(f"fps_total:   {steps/(t_roll+t_upd):,.0f} steps/s")

    if do_trace:
        with jax.profiler.trace("/tmp/jax_trace"):
            ts, _ = agent.train_epoch(ts)
            jax.block_until_ready(ts.params)
        print("trace written to /tmp/jax_trace")


if __name__ == "__main__":
    main()
