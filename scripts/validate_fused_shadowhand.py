"""Validate the ShadowHand scene on the fused Pallas path (VERDICT r4 #2).

Checks, on the real TPU:
1. fused_ok=True for the 256-pair scene (no_ground + slim pair cache),
2. the kernel compiles within the scoped-VMEM limit,
3. one step agrees with the XLA path,
4. physics-only throughput fused vs XLA.
Timing follows the axon-relay rules (host-fetch barrier, varied input,
chained state — see .claude/skills/verify/SKILL.md).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.physics import engine
    from isaacgymenv_tpu.physics import fused as fused_mod
    from isaacgymenv_tpu.utils.config import apply_cli_overrides, load_task_config

    cfg = load_task_config("ShadowHand")
    apply_cli_overrides(cfg, [f"env.numEnvs={n_envs}"])
    env = registry.get_task("ShadowHand")(cfg)
    m = env.model
    print(f"scene: nb={m.nb} ng={m.ng} n_pairs={m.n_pairs} no_ground={m.no_ground}")
    mode = fused_mod._pair_modes(n_envs, m)
    print(f"fused mode: {mode} (S, slim)  fused_ok={fused_mod.fused_ok(m, None, None, n_envs)}")

    venv = env.as_vec_env(seed=0)
    obs = venv.reset()
    key = jax.random.PRNGKey(0)
    # warm the state with random actions (XLA path state is fine for both)
    for _ in range(5):
        key, k = jax.random.split(key)
        obs, *_ = venv.step(jax.random.uniform(k, (n_envs, env.num_actions), minval=-1, maxval=1))
    sim0 = venv.state.sim
    ctrl = env._make_control(venv.state, jnp.zeros((n_envs, env.num_actions)))
    if isinstance(ctrl, tuple):  # ShadowHand returns (ctrl, state)
        ctrl = ctrl[0]

    # --- correctness: one control step fused vs XLA
    os.environ["ISAACGYMENV_TPU_NO_FUSED"] = "1"
    f_xla = jax.jit(lambda s: engine.step(m, None, s, ctrl, env.dt, env.substeps))
    ref = f_xla(sim0)
    ref_q = np.asarray(ref.q)
    os.environ["ISAACGYMENV_TPU_NO_FUSED"] = ""
    t0 = time.time()
    f_fused = jax.jit(lambda s: engine.step(m, None, s, ctrl, env.dt, env.substeps))
    out = f_fused(sim0)
    out_q = np.asarray(out.q)  # host fetch = compile+run barrier
    print(f"fused compile+first-run: {time.time()-t0:.1f}s")
    dq = np.abs(out_q - ref_q)
    print(f"max |q_fused - q_xla| = {dq.max():.2e}  (mean {dq.mean():.2e})")
    dcf = np.abs(np.asarray(out.contact_force) - np.asarray(ref.contact_force))
    print(f"max |cf_fused - cf_xla| = {dcf.max():.2e}")

    # --- throughput: chained steps, varied input, host-fetch barrier
    def bench(name):
        f = jax.jit(lambda s, c: engine.step(m, None, s, c, env.dt, env.substeps))
        s = sim0
        c = ctrl
        s = f(s, c)
        float(jnp.sum(s.q))  # warm + barrier
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            c = ctrl.replace(pos_target=ctrl.pos_target + 1e-4 * (i + 1))
            s = f(s, c)
        float(jnp.sum(s.q))
        dt_ = time.perf_counter() - t0
        sps = n_envs * iters / dt_
        print(f"{name}: {sps:,.0f} env-steps/s (control steps)")
        return sps

    sps_fused = bench("fused")
    os.environ["ISAACGYMENV_TPU_NO_FUSED"] = "1"
    sps_xla = bench("xla  ")
    os.environ["ISAACGYMENV_TPU_NO_FUSED"] = ""
    print(f"speedup: {sps_fused / sps_xla:.2f}x")


if __name__ == "__main__":
    main()
