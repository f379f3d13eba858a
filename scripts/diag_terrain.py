"""Diagnose the AnymalTerrain learning plateau (terrain_level stuck ~0.05).

Loads a trained checkpoint, rolls the deterministic policy, and reports
per-env commanded vs achieved base velocity, distance from spawn, foot
contact/slip statistics — separating "the policy can't track" from "the
physics can't walk".

Usage: python scripts/diag_terrain.py <ckpt> [task] [terrainType] [steps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DIAG_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ckpt = sys.argv[1]
    task = sys.argv[2] if len(sys.argv) > 2 else "AnymalTerrain"
    ttype = sys.argv[3] if len(sys.argv) > 3 else "trimesh"
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 400
    n = int(os.environ.get("DIAG_ENVS", "64"))

    from isaacgymenv_tpu.envs.registry import get_task
    from isaacgymenv_tpu.learning.checkpoint import load_train_state
    from isaacgymenv_tpu.learning.ppo import PPO
    from isaacgymenv_tpu.utils.config import load_task_config, load_train_config

    cfg = load_task_config(task, num_envs=n)
    cfg["env"].setdefault("terrain", {})
    cfg["env"]["terrain"]["terrainType"] = ttype
    # fixed straight-ahead command so tracking quality is unambiguous
    vx = float(os.environ.get("DIAG_VX", "0.8"))
    cfg["env"]["randomCommandVelocityRanges"] = {
        "linear_x": [vx, vx], "linear_y": [0.0, 0.0], "yaw": [0.0, 0.0],
    }
    cfg["env"].setdefault("learn", {})["pushRobots"] = False
    env = get_task(task)(cfg)
    tc = load_train_config(task)
    agent = PPO(env, tc)
    ts = load_train_state(agent, ckpt, validate=False)

    from isaacgymenv_tpu.ops import maths
    from isaacgymenv_tpu.physics.types import root_state

    state = env.initial_state(jax.random.PRNGKey(0))
    state = env._reset_envs(state, jnp.ones(n, bool), jax.random.PRNGKey(1))
    obs = env._observations(state, jnp.zeros((n, env.num_actions)))

    @jax.jit
    def policy(params, obs_stats, obs):
        o = agent._norm_obs(obs_stats, obs)
        mu, _, _ = agent.network.apply(params, o)
        return jnp.clip(mu, -1.0, 1.0)

    step = jax.jit(env.step)
    m = env.model
    if getattr(env, "terrain_origins", None) is not None:
        origins = np.asarray(
            env._env_origins(state.ts["terrain_levels"], state.ts["terrain_types"])
        )
    else:
        origins = np.zeros((n, 3))

    vels, heights, contacts, slips, torq = [], [], [], [], []
    done_count = np.zeros(n)
    for t in range(steps):
        a = policy(ts.params, ts.obs_stats, obs)
        state, obs_d, rew, done, extras = step(state, a)
        obs = obs_d["obs"] if isinstance(obs_d, dict) else obs_d
        rs = root_state(m, state.sim)[:, 0]
        q = rs[:, 3:7]
        v_body = maths.quat_rotate_inverse(q, rs[:, 7:10])
        vels.append(np.asarray(v_body))
        heights.append(np.asarray(rs[:, 2]))
        cf = np.asarray(state.sim.contact_force)
        feet = cf[:, env.feet_indices]
        contacts.append((feet[..., 2] > 1.0).mean())
        torq.append(np.abs(np.asarray(state.sim.dof_force)).mean())
        done_count += np.asarray(done)

    rs = np.asarray(root_state(m, state.sim)[:, 0])
    dist = np.linalg.norm(rs[:, :2] - origins[:, :2], axis=-1)
    V = np.stack(vels)  # (T, N, 3)
    half = V[steps // 2:]
    print(f"\n=== {task} ({ttype}) cmd vx={vx} n={n} steps={steps} "
          f"(dt={env.dt:.3f}s → {steps*env.dt:.1f}s) ===")
    print(f"achieved vx (2nd half): mean {half[..., 0].mean():+.3f} "
          f"p10 {np.percentile(half[..., 0].mean(0), 10):+.3f} "
          f"p90 {np.percentile(half[..., 0].mean(0), 90):+.3f}")
    print(f"achieved vy: {half[..., 1].mean():+.3f}  vz: {half[..., 2].mean():+.3f}")
    print(f"base height: {np.stack(heights)[steps//2:].mean():.3f}")
    print(f"distance from spawn @T: mean {dist.mean():.2f} m  "
          f"median {np.median(dist):.2f}  max {dist.max():.2f} "
          f"(promotion needs > {getattr(env, 'env_length', 8.0)/2:.1f})")
    print(f"feet in contact (frac): {np.mean(contacts):.3f}")
    print(f"mean |torque|: {np.mean(torq):.2f} Nm")
    print(f"episodes terminated per env: mean {done_count.mean():.2f} "
          f"(non-timeout resets indicate falls)")
    if "terrain_levels" in state.ts:
        print(f"terrain levels now: {np.asarray(state.ts['terrain_levels']).astype(float).mean():.2f}")


if __name__ == "__main__":
    main()
