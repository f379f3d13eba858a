"""Roofline / utilization report for the flagship env steps (VERDICT #10).

Measures, on the CURRENT backend (TPU under axon):
  1. device ceilings via microbenchmarks — HBM bandwidth (streaming add),
     VPU elementwise throughput (fused FMA chain), MXU matmul throughput
     (bf16) — the "speed of light" this chip actually delivers;
  2. per-task env-step throughput (random actions, post-warmup);
  3. XLA's own cost model for the step program (flops / bytes accessed via
     compiled.cost_analysis()) where available;
then reports achieved GB/s and GFLOP/s as fractions of the measured
ceilings.  Output: a markdown table (paste into docs/perf.md) + one JSON
line per task.

Usage: python scripts/roofline.py [task ...]   (default: flagship set)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FLAGSHIPS = ["Cartpole", "Ant", "Anymal", "AnymalTerrain", "ShadowHand", "Humanoid"]
N_ENVS = 4096
STEPS = 200


def _timeit_chained(fn, x, reps=3):
    """Time reps of x = fn(x, seed).  Microbenchmark rules learned the hard
    way on the axon relay:
      * the per-call RPC dispatch is ~40 us, so fn must hold >=10 ms of
        device work (iteration loop INSIDE the jit via lax.fori_loop);
      * the relay memoizes (executable, input buffers) -> result, so every
        call must receive a DIFFERENT input (chained output + a fresh seed
        scalar) and the chain must not converge to a fixpoint (bounded,
        seed-perturbed dynamics) — otherwise repeat calls return cached
        buffers and report 10-150x above hardware peak."""
    x = fn(x, jnp.float32(0.123))
    float(x.ravel()[0])  # real barrier: block_until_ready returns before
    t0 = time.perf_counter()  # remote execution completes on the relay
    for r in range(reps):
        x = fn(x, jnp.float32(0.37 + 0.11 * r))
    float(x.ravel()[0])
    return (time.perf_counter() - t0) / reps


def ceilings():
    """Measured device ceilings (GB/s, VPU GFLOP/s, MXU GFLOP/s)."""
    import jax.lax as lax

    # HBM: R sweeps of y = a*y + b over a 256 MB operand (read + write);
    # |a|<1 keeps values bounded, the seed keeps every sweep's data fresh
    n = 64 * 1024 * 1024
    R_BW = 32
    f_bw = jax.jit(
        lambda y, s: lax.fori_loop(
            0, R_BW, lambda i, y: 0.5 * y + (s + 1e-3 * i), y
        )
    )
    t = _timeit_chained(f_bw, jnp.ones((n,), jnp.float32))
    hbm_gbs = (R_BW * 2 * 4 * n) / t / 1e9  # per sweep: read y, write out

    # VPU: R x K fused multiply-adds per element on a VMEM-sized array
    K = 256
    m = 2 * 1024 * 1024
    R_VPU = 64

    def vpu(x, s):
        def body(i, acc):
            for _ in range(K):
                acc = acc * 0.999999 + (s * 1e-6)
            return acc
        return lax.fori_loop(0, R_VPU, body, x)

    t = _timeit_chained(jax.jit(vpu), jnp.ones((m,), jnp.float32))
    vpu_gflops = (R_VPU * 2 * K * m) / t / 1e9

    # MXU: R chained bf16 matmuls, renormalized each round so values stay
    # ~0.01 and carry a bf16-visible seed perturbation (~1%)
    d = 4096

    R_MM = 32

    def mm(a, s):
        def body(i, a):
            a = a @ a
            scale = 0.01 / jnp.maximum(jnp.max(jnp.abs(a)), 1e-9)
            return (a * scale + s * 1e-4).astype(jnp.bfloat16)
        return lax.fori_loop(0, R_MM, body, a)

    t = _timeit_chained(jax.jit(mm), jnp.full((d, d), 0.01, jnp.bfloat16))
    mxu_gflops = (R_MM * 2 * d**3) / t / 1e9
    return hbm_gbs, vpu_gflops, mxu_gflops


def measure_task(task: str, n_envs: int):
    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.utils.config import load_task_config

    cfg = load_task_config(task, num_envs=n_envs)
    env = registry.get_task(task)(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))

    def body(state, key):
        a = jax.random.uniform(
            key, (n_envs, env.num_actions), minval=-1.0, maxval=1.0
        )
        s, _obs, _r, _d, _e = env.step(state, a)
        return s, None

    @jax.jit
    def run(state, key):
        keys = jax.random.split(key, STEPS)
        s, _ = jax.lax.scan(body, state, keys)
        return s

    lowered = run.lower(state, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    cost = {}
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        cost = {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        pass

    state = compiled(state, jax.random.PRNGKey(1))
    float(state.sim.q.ravel()[0])  # real barrier (relay: see _timeit_chained)
    t0 = time.perf_counter()
    reps = 5
    for i in range(reps):
        state = compiled(state, jax.random.PRNGKey(2 + i))
    float(state.sim.q.ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    steps_s = n_envs * STEPS / dt
    return steps_s, dt / STEPS, cost


def main():
    tasks = sys.argv[1:] or FLAGSHIPS
    print(f"devices: {jax.devices()}")
    hbm, vpu, mxu = ceilings()
    print(
        f"measured ceilings: HBM {hbm:.0f} GB/s | VPU {vpu:.0f} GFLOP/s "
        f"| MXU(bf16) {mxu:.0f} GFLOP/s\n"
    )
    rows = []
    for task in tasks:
        try:
            steps_s, t_step, cost = measure_task(task, N_ENVS)
        except Exception as e:  # report and continue
            print(f"| {task} | ERROR {type(e).__name__}: {e} |")
            continue
        # per-batched-step bytes/flops straight from the XLA cost model
        bytes_step = cost.get("bytes", 0.0) / STEPS
        flops_step = cost.get("flops", 0.0) / STEPS
        ach_bw = bytes_step / t_step / 1e9
        ach_fl = flops_step / t_step / 1e9
        rows.append((task, steps_s, t_step * 1e6, ach_bw, ach_bw / hbm,
                     ach_fl, ach_fl / vpu))
        print(json.dumps({
            "task": task, "env_steps_per_s": round(steps_s),
            "step_us": round(t_step * 1e6, 1),
            "achieved_GBps": round(ach_bw, 1), "hbm_frac": round(ach_bw / hbm, 3),
            "achieved_GFLOPs": round(ach_fl, 1), "vpu_frac": round(ach_fl / vpu, 3),
        }))
    print("\n| task | env-steps/s | step µs | GB/s | %HBM | GFLOP/s | %VPU |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r[0]} | {r[1]:,.0f} | {r[2]:.0f} | {r[3]:.0f} | "
            f"{100*r[4]:.0f}% | {r[5]:.0f} | {100*r[6]:.0f}% |"
        )


if __name__ == "__main__":
    main()
