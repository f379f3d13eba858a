"""Multi-task throughput bench (one chip). Prints one line per task."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.utils.config import load_task_config


def bench(task, num_envs=4096, horizon=50, iters=4):
    cls = registry.get_task(task)
    cfg = load_task_config(task, num_envs=num_envs)
    env = cls(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def rollout(state, actions):
        def body(s, _):
            s, obs, rew, done, extras = env.step(s, actions)
            return s, rew
        return jax.lax.scan(body, state, None, length=horizon)

    actions = jnp.zeros((env.num_envs, env.num_actions))
    state, _ = rollout(state, actions)
    jax.block_until_ready(state.sim.q)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, r = rollout(state, actions)
    jax.block_until_ready(state.sim.q)
    dt = time.perf_counter() - t0
    sps = num_envs * horizon * iters / dt
    fin = bool(jnp.isfinite(state.sim.q).all())
    print(f"{task}: {sps:,.0f} env-steps/s (finite={fin})", flush=True)


if __name__ == "__main__":
    tasks = sys.argv[1:] or ["Cartpole", "Ant", "Humanoid", "Anymal", "Hound"]
    for t in tasks:
        try:
            bench(t)
        except Exception as e:
            print(f"{t}: FAILED {type(e).__name__}: {e}", flush=True)
