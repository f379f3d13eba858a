"""Fused-kernel HBM traffic + compute-boundedness evidence (docs/perf.md).

The XLA cost model is blind inside a pallas custom call (bytes/flops report
~0 for fused scenes), so this script derives what the roofline table cannot:

1. ANALYTIC per-env-step HBM bytes for the fused substep kernel — the sum
   of its SoA operand arrays (inputs + distinct outputs; state blocks are
   input/output-aliased so counted once per direction they actually move).
   achieved_GBps = bytes/step * steps/s, compared to the measured ceiling.
2. SUBSTEP SCALING: step time at substeps=2 vs substeps=4 for the same
   scene. HBM traffic per step is constant in the substep count (state is
   carried in VMEM across the in-kernel loop); compute is linear in it.
   A time ratio ~2x proves the kernel is compute(VPU)-bound, not HBM-bound.

Usage: python scripts/kernel_traffic.py [task ...]  (default Anymal)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_ENVS = 4096
STEPS = 100


def kernel_bytes_per_step(model, substeps: int) -> int:
    """HBM bytes moved per env per STEP by the fused kernel (f32)."""
    nb, ng, npair = model.nb, model.ng, model.n_pairs
    nq, nv, nd = model.nq, model.nv, model.nd
    state_io = 2 * (nq + nv + 3 * ng + 3 * npair)  # q/qd/slip in AND out
    inputs = nd  # PD targets
    outputs = nd + 3 * nb * 2 + 6 * nb  # dof_force, contact f/t, joint wrench
    return 4 * (state_io + inputs + outputs)


def measure(task: str, substeps: int | None):
    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.utils.config import load_task_config

    cfg = load_task_config(task, num_envs=N_ENVS)
    if substeps is not None:
        cfg["sim"]["substeps"] = substeps
    env = registry.get_task(task)(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))

    def body(s, k):
        a = jax.random.uniform(k, (N_ENVS, env.num_actions), minval=-1.0, maxval=1.0)
        s, *_ = env.step(s, a)
        return s, None

    @jax.jit
    def run(s, key):
        s, _ = jax.lax.scan(body, s, jax.random.split(key, STEPS))
        return s

    s = run(state, jax.random.PRNGKey(1))
    float(s.sim.q.ravel()[0])  # real barrier: relay block_until_ready is async
    t0 = time.perf_counter()
    for i in range(3):
        s = run(s, jax.random.PRNGKey(2 + i))
    float(s.sim.q.ravel()[0])
    dt = (time.perf_counter() - t0) / 3 / STEPS
    return env, dt


def main():
    tasks = sys.argv[1:] or ["Anymal"]
    for task in tasks:
        env, dt2 = measure(task, None)
        sub = int(env.cfg["sim"].get("substeps", 2))
        bytes_step = kernel_bytes_per_step(env.model, sub) * N_ENVS
        steps_s = N_ENVS / dt2
        _, dt4 = measure(task, sub * 2)
        print(json.dumps({
            "task": task, "substeps": sub,
            "env_steps_per_s": round(steps_s),
            "kernel_MB_per_batched_step": round(bytes_step / 1e6, 2),
            "achieved_GBps": round(bytes_step / dt2 / 1e9, 1),
            "step_us": round(dt2 * 1e6, 1),
            "step_us_2x_substeps": round(dt4 * 1e6, 1),
            "substep_time_ratio": round(dt4 / dt2, 2),
        }))


if __name__ == "__main__":
    main()
