"""Host-side replay visualizer — the training-friendly stand-in for the
reference's Vulkan viewer (ref: tasks/base/vec_task.py:270-512; SURVEY.md
maps the viewer to an "optional host-side replay visualizer").

Two modes:

  record: roll a task out (zero/random/checkpoint-policy actions), saving
          body poses + geom layout + terrain for one env to an .npz
  render: turn a recorded .npz into an animated GIF (matplotlib 3D: skeleton
          segments parent->child, contact spheres, terrain wireframe)

Usage:
  python scripts/replay.py record task=Anymal steps=200 out=anymal.npz \
      [checkpoint=runs/Anymal/nn/Anymal.ckpt] [actions=policy|zero|random] \
      [env=0] [num_envs=4] [seed=0]
  python scripts/replay.py render anymal.npz [out=anymal.gif] [fps=25] \
      [stride=2] [elev=20] [azim=-60]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_kv(argv):
    kv, pos = {}, []
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            kv[k] = v
        else:
            pos.append(a)
    return kv, pos


# ---------------------------------------------------------------- record


def record(argv):
    import jax

    # honor an explicit JAX_PLATFORMS even though sitecustomize pinned the
    # axon backend via jax.config (same workaround as train.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.utils.config import load_task_config

    kv, _ = _parse_kv(argv)
    task = kv.get("task", "Anymal")
    steps = int(kv.get("steps", "200"))
    out = kv.get("out", f"{task.lower()}_replay.npz")
    num_envs = int(kv.get("num_envs", "4"))
    env_id = int(kv.get("env", "0"))
    seed = int(kv.get("seed", "0"))
    checkpoint = kv.get("checkpoint", "")
    mode = kv.get("actions", "policy" if checkpoint else "zero")

    cfg = load_task_config(task, num_envs=num_envs)
    env = registry.get_task(task)(cfg)
    m = env.model
    state = env.initial_state(jax.random.PRNGKey(seed))

    act_fn = None
    ts = None
    if mode == "policy":
        if not checkpoint:
            raise SystemExit("actions=policy requires checkpoint=...")
        from isaacgymenv_tpu.learning.checkpoint import load_train_state
        from isaacgymenv_tpu.learning.ppo import PPO
        from isaacgymenv_tpu.utils.config import load_train_config

        agent = PPO(env, load_train_config(task))
        ts = load_train_state(agent, checkpoint)
        act_fn = jax.jit(lambda t, o, k: agent.act(t, o, True, k))

    step = jax.jit(env.step)
    key = jax.random.PRNGKey(seed + 1)
    poses, quats, rewards = [], [], []
    obs = None
    for i in range(steps):
        if mode == "policy":
            if obs is None:  # first obs from a no-op probe step
                _, od, *_ = step(state, jnp.zeros((num_envs, env.num_actions)))
                obs = od["obs"]
            key, k = jax.random.split(key)
            a = act_fn(ts, obs, k)
        elif mode == "random":
            key, k = jax.random.split(key)
            a = jax.random.uniform(
                k, (num_envs, env.num_actions), minval=-1.0, maxval=1.0
            )
        else:
            a = jnp.zeros((num_envs, env.num_actions))
        state, od, rew, done, _ = step(state, a)
        obs = od["obs"]
        poses.append(np.asarray(state.sim.body_pos[env_id]))
        quats.append(np.asarray(state.sim.body_quat[env_id]))
        rewards.append(float(rew[env_id]))

    data = dict(
        task=task,
        body_pos=np.stack(poses),            # (T, nb, 3)
        body_quat=np.stack(quats),           # (T, nb, 4)
        reward=np.asarray(rewards),
        parent=np.asarray(m.parent, np.int64),
        body_names=np.asarray(list(m.body_names)),
        geom_body=np.asarray(m.geom_body, np.int64),
        geom_offset=np.asarray(m.geom_offset),
        geom_radius=np.asarray(m.geom_radius),
        dt=float(env.dt),
    )
    if env.terrain is not None:
        t = env.terrain
        data.update(
            terrain_heights=np.asarray(t.heights),
            terrain_hscale=float(t.hscale),
            terrain_border=np.asarray([t.border_x, t.border_y]),
        )
    np.savez_compressed(out, **data)
    print(f"recorded {steps} steps of {task} env {env_id} -> {out}")
    return out


# ---------------------------------------------------------------- render


def _quat_rotate_np(q, v):
    u, w = q[..., :3], q[..., 3:4]
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


def render(argv):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    kv, pos = _parse_kv(argv)
    if not pos:
        raise SystemExit("render needs a recorded .npz path")
    path = pos[0]
    d = np.load(path, allow_pickle=True)
    out = kv.get("out", path.rsplit(".", 1)[0] + ".gif")
    fps = int(kv.get("fps", "25"))
    stride = int(kv.get("stride", "2"))

    body_pos = d["body_pos"][::stride]  # (T, nb, 3)
    body_quat = d["body_quat"][::stride]
    parent = d["parent"]
    gb = d["geom_body"]
    goff = d["geom_offset"]
    grad = d["geom_radius"]
    T, nb, _ = body_pos.shape

    center = body_pos[:, 0, :]  # root track
    span = max(1.0, 2.5 * float(np.abs(body_pos - center[:, None]).max()))

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.view_init(elev=float(kv.get("elev", "20")), azim=float(kv.get("azim", "-60")))

    def draw(i):
        ax.cla()
        c = center[i]
        p = body_pos[i]
        # skeleton segments
        for b in range(nb):
            pa = parent[b]
            if pa >= 0:
                ax.plot(
                    [p[pa, 0], p[b, 0]], [p[pa, 1], p[b, 1]], [p[pa, 2], p[b, 2]],
                    "-", color="tab:blue", lw=1.5,
                )
        # contact spheres at their world positions
        gpos = p[gb] + _quat_rotate_np(body_quat[i][gb], goff)
        ax.scatter(
            gpos[:, 0], gpos[:, 1], gpos[:, 2],
            s=np.clip(grad * 2000, 4, 60), c="tab:red", alpha=0.5, depthshade=False,
        )
        # terrain wireframe (or flat ground) around the root
        lo, hi = c[:2] - span, c[:2] + span
        if "terrain_heights" in d:
            hs = float(d["terrain_hscale"])
            bx, by = d["terrain_border"]
            H = d["terrain_heights"]
            i0 = int(max(0, (lo[0] - bx) / hs)); i1 = int(min(H.shape[0] - 1, (hi[0] - bx) / hs))
            j0 = int(max(0, (lo[1] - by) / hs)); j1 = int(min(H.shape[1] - 1, (hi[1] - by) / hs))
            if i1 > i0 and j1 > j0:
                ii = np.arange(i0, i1, max(1, (i1 - i0) // 24))
                jj = np.arange(j0, j1, max(1, (j1 - j0) // 24))
                X = bx + ii[:, None] * hs + 0 * jj[None, :]
                Y = by + jj[None, :] * hs + 0 * ii[:, None]
                Z = H[np.ix_(ii, jj)]
                ax.plot_wireframe(X, Y, Z, color="gray", lw=0.3, alpha=0.6)
        else:
            xx, yy = np.meshgrid(np.linspace(lo[0], hi[0], 2), np.linspace(lo[1], hi[1], 2))
            ax.plot_surface(xx, yy, 0 * xx, color="gray", alpha=0.15)
        ax.set_xlim(c[0] - span, c[0] + span)
        ax.set_ylim(c[1] - span, c[1] + span)
        ax.set_zlim(max(-0.1, c[2] - span), c[2] + span)
        ax.set_title(f"{d['task']}  t={i * stride}  r={d['reward'][:i * stride + 1].sum():.1f}")

    anim = FuncAnimation(fig, draw, frames=T, interval=1000 / fps)
    anim.save(out, writer=PillowWriter(fps=fps))
    plt.close(fig)
    print(f"rendered {T} frames -> {out}")
    return out


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("record", "render"):
        raise SystemExit(__doc__)
    (record if sys.argv[1] == "record" else render)(sys.argv[2:])


if __name__ == "__main__":
    main()
