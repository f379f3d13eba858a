"""Multi-task throughput bench (one chip). Prints one line per task."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.utils.config import load_task_config


def bench(task, num_envs=4096, horizon=50, iters=4, dr=False):
    cls = registry.get_task(task)
    cfg = load_task_config(task, num_envs=num_envs)
    if dr:  # domain randomization ON (DR-batched fused inputs path)
        cfg.setdefault("task", {})["randomize"] = True
    env = cls(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))

    # random actions per step: contact-active, limit-hitting regime (zero
    # actions would measure a standing-still sim)
    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(
                ka, (env.num_envs, env.num_actions), minval=-1.0, maxval=1.0
            )
            s, obs, rew, done, extras = env.step(s, a)
            return (s, k), rew
        (state, key), rews = jax.lax.scan(body, (state, key), None, length=horizon)
        return state, key, rews

    key = jax.random.PRNGKey(1)
    state, key, r = rollout(state, key)
    float(r.sum())  # real barrier: relay block_until_ready is async
    t0 = time.perf_counter()
    for _ in range(iters):
        state, key, r = rollout(state, key)
    float(r.sum())
    dt = time.perf_counter() - t0
    sps = num_envs * horizon * iters / dt
    fin = bool(jnp.isfinite(state.sim.q).all())
    tag = f"{task}+DR" if dr else task
    print(f"{tag}: {sps:,.0f} env-steps/s (finite={fin})", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--dr"]
    dr = "--dr" in sys.argv
    tasks = args or ["Cartpole", "Ant", "Humanoid", "Anymal", "Hound"]
    for t in tasks:
        try:
            bench(t, dr=dr)
        except Exception as e:
            print(f"{t}: FAILED {type(e).__name__}: {e}", flush=True)
