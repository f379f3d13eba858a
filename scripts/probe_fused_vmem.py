"""Measure Mosaic scoped-VMEM demand of the ShadowHand kernel vs pair count.

Compiles the fused substep with the pair list truncated to k pairs and
reports compile success / the demanded stack size from the error message.
"""
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    import os
    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.physics import engine
    from isaacgymenv_tpu.physics import fused as fused_mod
    from isaacgymenv_tpu.utils.config import apply_cli_overrides, load_task_config

    n_envs = 1024
    cfg = load_task_config("ShadowHand")
    apply_cli_overrides(cfg, [f"env.numEnvs={n_envs}"])
    env = registry.get_task("ShadowHand")(cfg)
    m0 = env.model
    venv = env.as_vec_env(seed=0)
    venv.reset()
    sim0 = venv.state.sim
    ctrl = env._make_control(venv.state, jnp.zeros((n_envs, env.num_actions)))
    if isinstance(ctrl, tuple):  # ShadowHand returns (ctrl, state)
        ctrl = ctrl[0]

    for k in [int(a) for a in sys.argv[1:]] or [0, 64, 128, 192, 256]:
        m = m0.replace(pair_geom=m0.pair_geom[:k], pair_surf=m0.pair_surf[:k])
        sim = sim0.replace(
            slip_p=(jnp.zeros((n_envs, k, 3)) if k else None)
        )
        try:
            f = jax.jit(lambda s: engine.step(m, None, s, ctrl, env.dt, env.substeps))
            out = f(sim)
            float(jnp.sum(out.q))
            print(f"pairs={k:4d}: COMPILED OK")
        except Exception as e:
            msg = str(e)
            mm = re.search(r"size ([0-9.]+)M and limit ([0-9.]+)M", msg)
            if mm:
                print(f"pairs={k:4d}: VMEM OOM demand={mm.group(1)}M limit={mm.group(2)}M")
            else:
                print(f"pairs={k:4d}: FAILED: {msg[:160]}")
        jax.clear_caches()


if __name__ == "__main__":
    main()
