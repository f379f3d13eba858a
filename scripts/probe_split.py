"""Compile + bench the split fused path on real scenes (TPU).

For each scene: report the _use_fused dispatch decision, compile the
engine step, and time physics-only steps/s on the split path vs the XLA
path (NO_FUSED=1).  Timing uses the scalar-fetch barrier + per-iteration
input variation (docs/perf.md "honest timing through the axon relay").

Usage: python scripts/probe_split.py [ShadowHand] [UsefulHound] [...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ENVS = int(os.environ.get("PROBE_ENVS", "1024"))
STEPS = 50


def bench_scene(task_name):
    import jax
    import jax.numpy as jnp

    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.physics import engine
    from isaacgymenv_tpu.utils.config import apply_cli_overrides, load_task_config

    cfg = load_task_config(task_name)
    apply_cli_overrides(cfg, [f"env.numEnvs={N_ENVS}"])
    env = registry.get_task(task_name)(cfg)
    venv = env.as_vec_env(seed=0)
    venv.reset()
    sim0 = venv.state.sim
    ctrl = env._make_control(venv.state, jnp.zeros((N_ENVS, env.num_actions)))
    if isinstance(ctrl, tuple):
        ctrl = ctrl[0]
    kind = engine._use_fused(env.model, getattr(env, "terrain", None), ctrl, sim0)
    print(f"{task_name}: dispatch={kind}", flush=True)

    def timed(label):
        @jax.jit
        def roll(sim, seed):
            def body(carry, _):
                s, k = carry
                k = k + 1
                # vary the control per step: defeats the relay's
                # (executable, inputs)->result memoization
                c = ctrl.replace(
                    pos_target=ctrl.pos_target
                    + 1e-4 * jnp.sin(k.astype(jnp.float32))
                )
                s = engine.step(
                    env.model, getattr(env, "terrain", None), s, c,
                    env.dt, env.substeps,
                )
                return (s, k), None

            (sim, seed), _ = jax.lax.scan(
                body, (sim, seed), None, length=STEPS
            )
            return sim, seed

        t_comp = time.perf_counter()
        sim, seed = roll(sim0, jnp.int32(0))
        float(jnp.sum(sim.q))  # completion barrier through the relay
        print(f"  {label}: compile+first {time.perf_counter() - t_comp:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        iters = 4
        for i in range(iters):
            sim, seed = roll(sim, seed)
        float(jnp.sum(sim.q))
        dt_ = time.perf_counter() - t0
        fps = N_ENVS * STEPS * iters / dt_
        print(f"  {label}: {fps:,.0f} env-steps/s (physics only)", flush=True)
        return fps

    results = {}
    if kind is not None:
        try:
            results[kind] = timed(kind)
        except Exception as e:
            print(f"  {kind}: FAILED {str(e)[:300]}", flush=True)
    os.environ["ISAACGYMENV_TPU_NO_FUSED"] = "1"
    try:
        results["xla"] = timed("xla")
    finally:
        os.environ.pop("ISAACGYMENV_TPU_NO_FUSED", None)
    if kind in results and "xla" in results and results["xla"]:
        print(f"  speedup {kind}/xla: {results[kind] / results['xla']:.2f}x",
              flush=True)
    return results


def main():
    for name in sys.argv[1:] or ["ShadowHand", "UsefulHound"]:
        bench_scene(name)


if __name__ == "__main__":
    main()
