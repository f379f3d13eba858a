"""Trifinger — cube repositioning with keypoint rewards + asymmetric critic.

Behavioral spec (ref: tasks/trifinger.py):
- trifingerpro.urdf (9 dofs, torque command mode, max 0.36 N·m), cube
  (6.5 cm, cube_multicolor_rrc.urdf) on a table; arena radius 0.195 m.
- act (N, 9): normalized torques, unscaled to +-0.36, with safety damping
  -kd_safe*qd then re-clamped (:992-1046).
- obs (N, 41): [dof_pos 9, dof_vel 9, object pose 7, goal pose 7,
  actions 9], scale-normalized to [-1,1] (:1401-1407, normalize_obs);
  asymmetric states (N, 123) add object velocity, fingertip states 3x13,
  joint torques 9 and fingertip wrenches 9 (:1409-1416).
- reward (:1293-1384): finger movement penalty + finger-to-object reach
  rate + logistic-kernel keypoints distance (8 cube corners, lgsk scale 30);
  reset only on timeout; success (pos within 2 cm, rot within 0.4 rad)
  logged per episode.
- reset (:783-990): robot default pose + noise, object random on table
  (uniform in circle), goal per task_difficulty (-1..4; default 4 = random
  pose in the air including orientation).
- Arena boundary: the high_table_boundary mesh (ref :187, :491) is modeled
  as a cylindrical containment band (SURF_WALL, inner radius 0.195 m,
  0.175 m tall) on the table body — the object cannot leave the workspace.
- Deviations (documented): fingertip force sensors are approximated by the
  tips' net contact wrenches.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import builder as B
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    JT_FIXED,
    JT_FREE,
    dof_pos,
    dof_vel,
    root_state,
    set_dof_state,
    set_root_state,
)
from isaacgymenv_tpu.physics.urdf import AssetOptions, load_urdf
from isaacgymenv_tpu.utils.config import asset_root

ARENA_RADIUS = 0.195
CUBE = 0.065
MAX_TORQUE = 0.36
MAX_VEL = 10.0
JOINT_LOW = np.array([-0.33, 0.0, -2.7] * 3, np.float32)
JOINT_HIGH = np.array([1.0, 1.57, 0.0] * 3, np.float32)
JOINT_DEFAULT = np.array([0.0, 0.9, -2.0] * 3, np.float32)
SAFETY_DAMPING = np.array([0.08, 0.08, 0.04] * 3, np.float32)
RADIUS_3D = CUBE * np.sqrt(3) / 2
MAX_COM_DIST = ARENA_RADIUS - RADIUS_3D
MIN_H, MAX_H = CUBE / 2, 0.1


def lgsk_kernel(x, scale=50.0, eps=2.0):
    """Logistic kernel bounding to (0, 1/(2+eps)] (ref: trifinger.py:1261)."""
    scaled = x * scale
    return 1.0 / (jnp.exp(scaled) + eps + jnp.exp(-scaled))


def gen_keypoints(pose, size=CUBE):
    """8 cube-corner keypoints in world frame (ref: trifinger.py:1278)."""
    pos, quat = pose[..., 0:3], pose[..., 3:7]
    corners = []
    for i in range(8):
        loc = jnp.array(
            [(i % 2) - 0.5, ((i // 2) % 2) - 0.5, ((i // 4) % 2) - 0.5]
        ) * size
        corners.append(
            pos + maths.quat_apply(quat, jnp.broadcast_to(loc, pos.shape))
        )
    return jnp.stack(corners, axis=-2)  # (..., 8, 3)


@register("Trifinger")
class Trifinger(TaskEnv):
    num_obs = 41
    num_actions = 9

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 750)))
        super().__init__(cfg)
        self.asymmetric_obs = bool(e.get("asymmetric_obs", True))
        self.task_difficulty = int(e.get("task_difficulty", 4))
        self.command_mode = e.get("command_mode", "torque")
        self.normalize_action = bool(e.get("normalize_action", True))
        self.normalize_obs = bool(e.get("normalize_obs", True))
        self.safety_damping = bool(e.get("apply_safety_damping", True))
        rt = e.get("reward_terms", {})
        self.w_move = float(rt.get("finger_move_penalty", {}).get("weight", -0.5))
        self.w_reach = float(rt.get("finger_reach_object_rate", {}).get("weight", -250))
        self.w_dist = float(rt.get("object_dist", {}).get("weight", 2000))
        self.w_rot = float(rt.get("object_rot", {}).get("weight", 2000))
        self.use_keypoints = bool(rt.get("keypoints_dist", {}).get("activate", True))
        term = e.get("termination_conditions", {}).get("success", {})
        self.pos_tol = float(term.get("position_tolerance", 0.02))
        self.rot_tol = float(term.get("orientation_tolerance", 0.4))
        rdist = e.get("reset_distribution", {})
        self.robot_reset = rdist.get("robot_initial_state", {"type": "default"})
        self.object_reset = rdist.get("object_initial_state", {"type": "random"})

        self._build_model(cfg)
        self._build_scales()

    def _build_model(self, cfg):
        rb, rinfo = load_urdf(
            os.path.join(
                asset_root(),
                "trifinger/robot_properties_fingers/urdf/pro/trifingerpro.urdf",
            ),
            AssetOptions(fix_base_link=True, collapse_fixed_joints=False, density=1000.0),
        )
        for b in rb.bodies:
            if b.jtype in (1, 2):
                b.drive_mode = DRIVE_EFFORT
                b.stiffness = 0.0
                b.damping = 0.0
                b.effort = MAX_TORQUE
        # table surface at z=0 (the URDF table is at ground level)
        table = rb.add_body(
            "table", -1, JT_FIXED, joint_pos=(0, 0, -0.01), mass=10.0,
            inertia=B.box_inertia(10.0, 1.0, 1.0, 0.02),
        )
        rb.add_surface(table, B.ModelBuilder.SURF_BOX, (0, 0, 0), None, (0.5, 0.5, 0.01))
        # arena boundary wall: the high_table_boundary mesh is an annulus of
        # inner radius 0.195 m rising 0.175 m above the table (measured from
        # the reference STL; ref trifinger.py:187, :491) — modeled as a
        # cylindrical containment band on the table body (SURF_WALL).  The
        # table body sits at z=-0.01, so the band center compensates +0.01.
        rb.add_surface(
            table, B.ModelBuilder.SURF_WALL, (0, 0, 0.0975), None,
            (0.195, 0.0875, 0.0), friction=0.1,
        )
        ob, _ = load_urdf(
            os.path.join(asset_root(), "trifinger/objects/urdf/cube_multicolor_rrc.urdf"),
            AssetOptions(density=260.0),  # ~74 g rrc cube
        )
        rb.merge(ob)
        rb.gravity = np.array(self.gravity)
        self.model = attach_effective_masses(rb.finalize())
        lb = rinfo["link_body"]
        self.tip_bodies = np.array(
            [lb[f"finger_tip_link_{a}"] for a in (0, 120, 240)]
        )
        self.object_actor = self.model.n_actors - 1
        self.object_body = self.model.actor_root[self.object_actor]

    def _build_scales(self):
        obs_lo = np.concatenate(
            [
                JOINT_LOW, -MAX_VEL * np.ones(9),
                [-0.3, -0.3, 0.0], -np.ones(4),
                [-0.3, -0.3, 0.0], -np.ones(4),
                -MAX_TORQUE * np.ones(9),
            ]
        )
        obs_hi = np.concatenate(
            [
                JOINT_HIGH, MAX_VEL * np.ones(9),
                [0.3, 0.3, 0.3], np.ones(4),
                [0.3, 0.3, 0.3], np.ones(4),
                MAX_TORQUE * np.ones(9),
            ]
        )
        self.obs_lo, self.obs_hi = jnp.array(obs_lo), jnp.array(obs_hi)
        # states: obs + object vel(6) + fingertip states(39) + torques(9) + wrenches(18)
        st_lo = np.concatenate(
            [
                obs_lo, -0.5 * np.ones(6),
                np.tile(np.concatenate([[-0.4, -0.4, 0.0], -np.ones(4), -0.2 * np.ones(6)]), 3),
                -MAX_TORQUE * np.ones(9), -np.ones(18),
            ]
        )
        st_hi = np.concatenate(
            [
                obs_hi, 0.5 * np.ones(6),
                np.tile(np.concatenate([[0.4, 0.4, 0.5], np.ones(4), 0.2 * np.ones(6)]), 3),
                MAX_TORQUE * np.ones(9), np.ones(18),
            ]
        )
        self.st_lo, self.st_hi = jnp.array(st_lo), jnp.array(st_hi)
        self.num_states = st_lo.shape[0] if self.asymmetric_obs else 0

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "goal": jnp.zeros((n, 7)).at[:, 6].set(1.0),
            "actions": jnp.zeros((n, 9)),
            "last_tips": jnp.zeros((n, 3, 3)),
            "last_obj": jnp.zeros((n, 13)),
            "successes": jnp.zeros(n),
        }

    def _random_xy(self, key, n, max_r):
        kr, kt = jax.random.split(key)
        r = jnp.sqrt(jax.random.uniform(kr, (n,))) * max_r
        th = jax.random.uniform(kt, (n,), minval=0.0, maxval=2 * jnp.pi)
        return r * jnp.cos(th), r * jnp.sin(th)

    def _sample_goal(self, key, n):
        k1, k2, k3 = jax.random.split(key, 3)
        d = self.task_difficulty
        if d in (-1, 1):
            x, y = self._random_xy(k1, n, MAX_COM_DIST)
            z = jnp.full((n,), CUBE / 2)
            if d == -1:
                yaw = jax.random.uniform(k2, (n,), minval=-jnp.pi, maxval=jnp.pi)
                zu = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (n, 3))
                quat = maths.quat_from_angle_axis(yaw, zu)
            else:
                quat = jnp.zeros((n, 4)).at[:, 3].set(1.0)
        elif d == 2:
            x = jnp.zeros(n); y = jnp.zeros(n)
            z = jnp.full((n,), MIN_H + 0.05)
            quat = jnp.zeros((n, 4)).at[:, 3].set(1.0)
        elif d == 3:
            x, y = self._random_xy(k1, n, MAX_COM_DIST)
            z = jax.random.uniform(k2, (n,), minval=MIN_H, maxval=MAX_H)
            quat = jnp.zeros((n, 4)).at[:, 3].set(1.0)
        else:  # 4
            x, y = self._random_xy(k1, n, MAX_COM_DIST)
            z = jax.random.uniform(k2, (n,), minval=RADIUS_3D, maxval=MAX_H)
            quat = maths.quat_unit(jax.random.normal(k3, (n, 4)))
        return jnp.concatenate(
            [x[:, None], y[:, None], z[:, None], quat], axis=-1
        )

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        k_dof, k_obj, k_yaw, k_goal = jax.random.split(key, 4)
        mm = mask[:, None]

        # robot dofs
        pos = jnp.broadcast_to(jnp.array(JOINT_DEFAULT), (n, 9))
        vel = jnp.zeros((n, 9))
        if self.robot_reset.get("type", "default") == "random":
            noise = 2 * jax.random.uniform(k_dof, (n, 18)) - 1
            pos = pos + float(self.robot_reset.get("dof_pos_stddev", 0.4)) * noise[:, :9]
            vel = vel + float(self.robot_reset.get("dof_vel_stddev", 0.2)) * noise[:, 9:]
        sim = set_dof_state(
            m, state.sim,
            jnp.where(mm, pos, dof_pos(m, state.sim)),
            jnp.where(mm, vel, dof_vel(m, state.sim)),
        )

        # object pose: random on table
        x, y = self._random_xy(k_obj, n, MAX_COM_DIST)
        yaw = jax.random.uniform(k_yaw, (n,), minval=-jnp.pi, maxval=jnp.pi)
        zu = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (n, 3))
        quat = maths.quat_from_angle_axis(yaw, zu)
        obj = (
            jnp.zeros((n, 13))
            .at[:, 0].set(x).at[:, 1].set(y)
            .at[:, 2].set(CUBE / 2 + 0.0015)
            .at[:, 3:7].set(quat)
        )
        rs = root_state(m, sim)
        rs = rs.at[:, self.object_actor].set(
            jnp.where(mm, obj, rs[:, self.object_actor])
        )
        sim = set_root_state(m, sim, rs)

        ts = dict(state.ts)
        ts["goal"] = jnp.where(mm, self._sample_goal(k_goal, n), ts["goal"])
        ts["last_tips"] = jnp.where(mask[:, None, None], 0.0, ts["last_tips"])
        ts["last_obj"] = jnp.where(mm, obj, ts["last_obj"])
        ts["successes"] = jnp.where(mask, 0.0, ts["successes"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    # ------------------------------------------------------------------
    def _make_control(self, state, actions):
        m = self.model
        n = actions.shape[0]
        ts = dict(state.ts)
        # normalized action [-1,1] -> torque range (symmetric: just scale)
        tau = actions * MAX_TORQUE if self.normalize_action else actions
        tau = jnp.clip(tau, -MAX_TORQUE, MAX_TORQUE)
        if self.safety_damping:
            tau = tau - jnp.array(SAFETY_DAMPING) * dof_vel(m, state.sim)
            tau = jnp.clip(tau, -MAX_TORQUE, MAX_TORQUE)
        ts["actions"] = actions
        return (
            engine.Control.zero(m, n).replace(effort=tau),
            state.replace(ts=ts),
        )

    def _tip_states(self, state):
        sim = state.sim
        t = self.tip_bodies
        return jnp.concatenate(
            [sim.body_pos[:, t], sim.body_quat[:, t], sim.body_linvel[:, t], sim.body_angvel[:, t]],
            axis=-1,
        )  # (N, 3, 13)

    def _observations(self, state, actions):
        m = self.model
        rs = root_state(m, state.sim)[:, self.object_actor]
        obs = jnp.concatenate(
            [
                dof_pos(m, state.sim),
                dof_vel(m, state.sim),
                rs[:, 0:7],
                state.ts["goal"],
                state.ts["actions"],
            ],
            axis=-1,
        )
        if self.normalize_obs:
            obs = maths.unscale(obs, self.obs_lo, self.obs_hi)
        return obs

    def _states(self, state, obs):
        if not self.asymmetric_obs:
            return None
        m = self.model
        rs = root_state(m, state.sim)[:, self.object_actor]
        tips = self._tip_states(state)
        wrench = jnp.concatenate(
            [
                state.sim.contact_force[:, self.tip_bodies],
                state.sim.contact_torque[:, self.tip_bodies],
            ],
            axis=-1,
        ).reshape(obs.shape[0], -1)
        raw_obs = jnp.concatenate(
            [
                dof_pos(m, state.sim), dof_vel(m, state.sim),
                rs[:, 0:7], state.ts["goal"], state.ts["actions"],
            ],
            axis=-1,
        )
        st = jnp.concatenate(
            [
                raw_obs,
                rs[:, 7:13],
                tips.reshape(obs.shape[0], -1),
                state.sim.dof_force,
                wrench,
            ],
            axis=-1,
        )
        if self.normalize_obs:
            st = maths.unscale(st, self.st_lo, self.st_hi)
        return st

    def _reward_done(self, state, obs, actions):
        """ref: compute_trifinger_reward (trifinger.py:1293-1384)."""
        m = self.model
        ts = dict(state.ts)
        rs = root_state(m, state.sim)[:, self.object_actor]
        tips = self._tip_states(state)[:, :, 0:3]
        dt = self.dt

        tip_vel = (tips - ts["last_tips"]) / dt
        move_pen = self.w_move * jnp.sum(tip_vel**2, axis=(-1, -2))

        curr_norm = jnp.linalg.norm(tips - rs[:, None, 0:3], axis=-1)
        prev_norm = jnp.linalg.norm(
            ts["last_tips"] - ts["last_obj"][:, None, 0:3], axis=-1
        )
        reach = self.w_reach * jnp.sum(curr_norm - prev_norm, axis=-1)

        goal = ts["goal"]
        if self.use_keypoints:
            kp_obj = gen_keypoints(rs[:, 0:7])
            kp_goal = gen_keypoints(goal)
            d = jnp.linalg.norm(kp_obj - kp_goal, axis=-1)
            pose_reward = self.w_dist * dt * lgsk_kernel(d, scale=30.0, eps=2.0).mean(-1)
        else:
            od = jnp.linalg.norm(rs[:, 0:3] - goal[:, 0:3], axis=-1)
            dist_r = self.w_dist * dt * lgsk_kernel(od, scale=50.0, eps=2.0)
            ang = maths.quat_diff_rad(rs[:, 3:7], goal[:, 3:7])
            rot_r = self.w_rot * dt / (3.0 * jnp.abs(ang) + 0.01)
            pose_reward = dist_r + rot_r

        total = move_pen + reach + pose_reward
        done = state.progress >= self.max_episode_length - 1

        # success logging (ref: _check_termination :1063-1110)
        pos_ok = jnp.linalg.norm(rs[:, 0:3] - goal[:, 0:3], axis=-1) <= self.pos_tol
        rot_ok = jnp.abs(maths.quat_diff_rad(rs[:, 3:7], goal[:, 3:7])) <= self.rot_tol
        if self.task_difficulty < 4:
            success = pos_ok
        else:
            success = pos_ok & rot_ok
        ts["successes"] = success.astype(jnp.float32)
        ts["last_tips"] = tips
        ts["last_obj"] = rs
        state = state.replace(ts=ts)
        info = {
            "episode": {
                "success": ts["successes"].mean(),
                "pose_reward": pose_reward.mean(),
            }
        }
        return state, total, done, info
