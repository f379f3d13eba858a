"""Check for within-control-step root-velocity oscillation (aliasing).

Runs the trained AnymalTerrain policy, but advances the sim substep-by-
substep (engine.step with substeps=1 at h = dt/substeps), recording the
root velocity after EVERY substep.  If the end-of-step sampled velocity
systematically exceeds the within-step mean, the reward channel is reading
an aliased lurch, not sustained locomotion.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.learning.checkpoint import load_train_state
    from isaacgymenv_tpu.learning.ppo import PPO
    from isaacgymenv_tpu.physics import engine
    from isaacgymenv_tpu.physics.types import root_state
    from isaacgymenv_tpu.utils.config import (
        apply_cli_overrides,
        load_task_config,
        load_train_config,
    )

    task = "AnymalTerrain"
    ckpt = "runs/AnymalTerrain_r4/nn/last_AnymalTerrain_r4.ckpt"
    n_envs = 64
    task_cfg = load_task_config(task)
    apply_cli_overrides(task_cfg, [
        "env.terrain.terrainType=trimesh", f"env.numEnvs={n_envs}",
    ])
    train_cfg = load_train_config(task, None)
    env = registry.get_task(task)(task_cfg)
    agent = PPO(env, train_cfg)
    ts = load_train_state(agent, ckpt)
    venv = env.as_vec_env(seed=0)
    obs_dict = venv.reset()
    act = jax.jit(lambda t, o, k: agent.act(t, o, True, k))
    key = jax.random.PRNGKey(0)
    m = env.model

    # settle 100 control steps through the normal path
    for t in range(100):
        key, k = jax.random.split(key)
        obs_dict, _, _, _ = venv.step(act(ts, obs_dict["obs"], k))

    # now advance manually: same action held, substep-by-substep
    h = env.dt / env.substeps

    @jax.jit
    def one_sub(sim, ctrl):
        return engine.step(m, env.terrain, sim, ctrl, h, 1)

    T = 40
    v_sub = []   # (T*substeps, N) |v_xy| after each substep
    v_ctrl = []  # (T, N) |v_xy| at control boundaries (what reward sees)
    sim = venv.state.sim
    stt = venv.state
    for t in range(T):
        key, k = jax.random.split(key)
        a = act(ts, obs_dict["obs"], k)
        actions = jnp.clip(a, -env.clip_actions, env.clip_actions)
        ctrl = env._make_control(stt.replace(sim=sim), actions)
        for s in range(env.substeps):
            sim = one_sub(sim, ctrl)
            rs = root_state(m, sim)[:, 0]
            v_sub.append(np.asarray(jnp.linalg.norm(rs[:, 7:9], axis=-1)))
        v_ctrl.append(v_sub[-1])
        # rebuild obs through the env observation fn on the advanced sim
        stt = stt.replace(sim=sim)
        obs = env._observations(stt, actions)
        obs_dict = {"obs": jnp.clip(obs, -env.clip_obs, env.clip_obs)}

    v_sub = np.stack(v_sub)            # (T*S, N)
    v_ctrl = np.stack(v_ctrl)          # (T, N)
    S = env.substeps
    per_step = v_sub.reshape(T, S, -1)  # (T, S, N)
    print(f"substeps/control step: {S},  h={h:.5f}")
    print(f"mean |v| at control boundary (reward sample): {v_ctrl.mean():.3f}")
    print(f"mean |v| across ALL substeps:                 {v_sub.mean():.3f}")
    print("mean |v| by substep phase:", " ".join(f"{per_step[:, s].mean():.3f}" for s in range(S)))
    # also: mean over step vs end sample per (t, env)
    ratio = per_step[..., :].mean(1) / np.maximum(per_step[:, -1], 1e-6)
    print(f"mean(within-step mean / end sample): {ratio.mean():.3f}")


if __name__ == "__main__":
    main()
