"""Diagnose the AnymalTerrain slow-walk optimum (VERDICT r4 weak #2).

Loads the r4 checkpoint, runs the deterministic policy, and compares:
  - v_inst: base-frame linear velocity as the reward sees it (root state)
  - v_fd:   finite-difference velocity of the root xy over the control step
  - command, tracking reward, net displacement, torque saturation fraction

If v_inst tracks the command but v_fd does not, the policy found a
vibration exploit (instantaneous velocity at sampling instants without net
displacement) or the stored root velocity is inconsistent with position
integration.
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
    from isaacgymenv_tpu.ops import maths
    from isaacgymenv_tpu.physics.types import root_state
    from isaacgymenv_tpu.utils.config import (
        apply_cli_overrides,
        load_task_config,
        load_train_config,
    )

    task = "AnymalTerrain"
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "runs/AnymalTerrain_r4/nn/last_AnymalTerrain_r4.ckpt"
    n_envs = 256
    task_cfg = load_task_config(task)
    apply_cli_overrides(task_cfg, [
        "env.terrain.terrainType=trimesh",
        f"env.numEnvs={n_envs}",
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

    def grab(state):
        rs = root_state(m, state.sim)[:, 0]
        q = rs[:, 3:7]
        v_inst = maths.quat_rotate_inverse(q, rs[:, 7:10])
        return np.asarray(rs[:, 0:3]), np.asarray(v_inst), np.asarray(rs[:, 3:7]), np.asarray(state.ts["commands"]), np.asarray(jnp.abs(state.sim.dof_force))

    T = 300
    pos_hist, vin_hist, cmd_hist, tq_hist, quat_hist = [], [], [], [], []
    for t in range(T):
        st = venv.state
        p, vi, q, c, tq = grab(st)
        pos_hist.append(p); vin_hist.append(vi); cmd_hist.append(c); tq_hist.append(tq)
        quat_hist.append(q)
        key, k = jax.random.split(key)
        a = act(ts, obs_dict["obs"], k)
        obs_dict, rew, done, _ = venv.step(a)

    pos = np.stack(pos_hist)   # (T, N, 3)
    vin = np.stack(vin_hist)   # (T, N, 3)
    cmd = np.stack(cmd_hist)   # (T, N, 4)
    tq = np.stack(tq_hist)     # (T, N, nd)
    quat = np.stack(quat_hist)

    dt = env.dt
    # finite-difference world xy velocity, rotated into base frame (yaw only)
    dp = (pos[1:] - pos[:-1]) / dt   # (T-1, N, 3) world
    # base yaw from quaternion at step start
    fwd = np.stack([1 - 2*(quat[..., 1]**2 + quat[..., 2]**2),
                    2*(quat[..., 0]*quat[..., 1] + quat[..., 2]*quat[..., 3])], -1)
    yaw = np.arctan2(fwd[..., 1], fwd[..., 0])[:-1]
    c_, s_ = np.cos(yaw), np.sin(yaw)
    vfd_x = c_ * dp[..., 0] + s_ * dp[..., 1]
    vfd_y = -s_ * dp[..., 0] + c_ * dp[..., 1]

    # skip first 50 steps (settle) and mask big jumps (resets/pushes)
    sl = slice(50, T - 1)
    jump = np.linalg.norm(dp[..., :2], axis=-1) > 3.0
    w = ~jump[sl]

    cmdn = np.linalg.norm(cmd[:-1, :, :2], axis=-1)[sl][w]
    vin_xy = vin[:-1][sl][..., :2]
    vfd = np.stack([vfd_x, vfd_y], -1)[sl]
    err_inst = np.sum((cmd[:-1, :, :2][sl] - vin_xy) ** 2, -1)[w]
    err_fd = np.sum((cmd[:-1, :, :2][sl] - vfd) ** 2, -1)[w]

    print(f"mean |cmd|                 : {cmdn.mean():.3f} m/s")
    print(f"mean |v_inst| (reward sees): {np.linalg.norm(vin_xy, axis=-1)[w].mean():.3f} m/s")
    print(f"mean |v_fd|   (actual)     : {np.linalg.norm(vfd, axis=-1)[w].mean():.3f} m/s")
    print(f"tracking rew (inst)        : {np.exp(-err_inst / 0.25).mean():.3f}")
    print(f"tracking rew (fd)          : {np.exp(-err_fd / 0.25).mean():.3f}")
    # net displacement over the window per env
    net = np.linalg.norm(pos[T - 1, :, :2] - pos[50, :, :2], axis=-1)
    print(f"net displacement ({(T-51)*dt:.1f}s)  : mean {net.mean():.2f} m")
    sat = (tq[sl] > 79.0).mean()
    print(f"torque-sat fraction (|tq|>79): {sat:.4f}")
    print(f"mean |torque|              : {tq[sl].mean():.2f} Nm  p95 {np.percentile(tq[sl], 95):.1f}")
    # correlation: per-sample v_inst vs v_fd (x component)
    vi_f = vin_xy[w][..., 0].ravel(); vf_f = vfd[w][..., 0].ravel()
    cc = np.corrcoef(vi_f, vf_f)[0, 1]
    print(f"corr(v_inst_x, v_fd_x)     : {cc:.3f}")
    # high-frequency content: per-step delta of v_inst
    dv = np.abs(np.diff(vin[sl][..., 0], axis=0))
    print(f"mean |delta v_inst_x| per step: {dv.mean():.3f} m/s (osc indicator)")


if __name__ == "__main__":
    main()
