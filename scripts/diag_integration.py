"""Compare Δp/h of the root against the stored root velocity, fused vs XLA.

If they disagree on one path only, that path's integrator is broken.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.physics import engine
    from isaacgymenv_tpu.physics.types import root_state
    from isaacgymenv_tpu.utils.config import apply_cli_overrides, load_task_config

    task = "AnymalTerrain"
    n_envs = 64
    task_cfg = load_task_config(task)
    apply_cli_overrides(task_cfg, [
        "env.terrain.terrainType=trimesh", f"env.numEnvs={n_envs}",
    ])
    env = registry.get_task(task)(task_cfg)
    venv = env.as_vec_env(seed=0)
    obs = venv.reset()
    key = jax.random.PRNGKey(0)
    # random-walk actions for a few steps to get contact-rich motion
    for t in range(30):
        key, k = jax.random.split(key)
        a = 0.5 * jax.random.normal(k, (n_envs, env.num_actions))
        obs, _, _, _ = venv.step(a)

    m = env.model
    stt = venv.state
    sim0 = stt.sim
    h = env.dt / env.substeps
    actions = jnp.zeros((n_envs, env.num_actions))
    ctrl = env._make_control(stt, actions)

    for name, nofused in [("fused", False), ("xla", True)]:
        os.environ["ISAACGYMENV_TPU_NO_FUSED"] = "1" if nofused else ""
        f = jax.jit(lambda s: engine.step(m, env.terrain, s, ctrl, h, 1))
        sim1 = f(sim0)
        rs0 = np.asarray(root_state(m, sim0)[:, 0])
        rs1 = np.asarray(root_state(m, sim1)[:, 0])
        dp = (rs1[:, 0:3] - rs0[:, 0:3]) / h
        v0 = rs0[:, 7:10]
        v1 = rs1[:, 7:10]
        # semi-implicit: p_new = p + R(quat_old) v_b_new * h.  v1 is
        # R(quat_new) v_b_new — close to that product for small rotation.
        err = np.linalg.norm(dp - v1, axis=-1)
        print(f"[{name}] mean|dp/h - v_new|={err.mean():.4f}  "
              f"mean|v_new|={np.linalg.norm(v1, -1).mean():.4f}  "
              f"mean|dp/h|={np.linalg.norm(dp, -1).mean():.4f}  "
              f"max err={err.max():.4f}")


if __name__ == "__main__":
    main()
