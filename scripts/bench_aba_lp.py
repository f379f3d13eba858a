"""A/B microbenchmark: engine step throughput with serial vs level-parallel
FK/ABA scheduling on a task (one chip).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_aba_lp.py [task] [num_envs]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.physics import dynamics, kinematics
from isaacgymenv_tpu.utils.config import load_task_config


def bench(task: str, num_envs: int, variant: str) -> float:
    cls = registry.get_task(task)
    cfg = load_task_config(task, num_envs=num_envs)
    env = cls(cfg)
    key = jax.random.PRNGKey(0)
    state = env.initial_state(key)

    @jax.jit
    def rollout(state, actions):
        def body(s, _):
            s, obs, rew, done, extras = env.step(s, actions)
            return s, rew

        state, rews = jax.lax.scan(body, state, None, length=50)
        return state, rews.sum()

    actions = jnp.zeros((env.num_envs, env.num_actions))
    state, r = rollout(state, actions)
    float(r)  # real barrier: relay block_until_ready is async

    t0 = time.perf_counter()
    iters = 4
    for i in range(iters):
        # vary an input per call: damped dynamics converge to a fixpoint,
        # and identical (executable, inputs) re-trigger the axon relay's
        # memoization (reports 10-150x above peak — see verify SKILL.md)
        actions = actions.at[:, 0].set(1e-3 * (i + 1))
        state, r = rollout(state, actions)
    float(r)
    dt = time.perf_counter() - t0
    sps = num_envs * 50 * iters / dt
    print(f"{variant}: {sps:,.0f} env-steps/s", flush=True)
    return sps


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "Anymal"
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    fk0, aba0 = kinematics.fk, dynamics.aba
    results = {}
    try:
        results["serial fk+aba"] = bench(task, num_envs, "serial fk+aba")
        dynamics.aba = dynamics.aba_lp
        results["fk + aba_lp"] = bench(task, num_envs, "fk + aba_lp")
        kinematics.fk = kinematics.fk_lp
        results["fk_lp + aba_lp"] = bench(task, num_envs, "fk_lp + aba_lp")
        dynamics.aba = aba0
        results["fk_lp + aba"] = bench(task, num_envs, "fk_lp + aba")
    finally:
        kinematics.fk, dynamics.aba = fk0, aba0
    base = results["serial fk+aba"]
    for k, v in results.items():
        print(f"{k}: {v / base:.3f}x")


if __name__ == "__main__":
    main()
