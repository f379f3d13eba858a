"""BallBalance — tripod tray balancing a bouncing ball.

Behavioral spec (ref: tasks/ball_balance.py):
- procedural balance-bot (:136-231): free tray (cylinder r=.5 t=.02 rho=100)
  on 3 two-segment legs (capsules r=.02, hinges axis y; upper +-45deg, lower
  -70..90deg); lower-leg feet pinned to the ground by translation attractors
  (:305-318) -> engine anchors here; plus a free ball (sphere r=.1 rho=200).
- dofs [upper0, lower0, upper1, lower1, upper2, lower2]: lower legs
  position-driven Kp=4000 Kd=100, uppers free (:289-296).
- act (N, 3): lower-leg target velocities, integrated
  target += dt * actionSpeedScale * a, clamped to limits (:415-421).
- obs (N, 24): actuated dof pos(3)+vel(3), ball pos(3), ball linvel(3),
  sensor force(3)/20, 3x sensor torque(3)/20 (:337-351).  The reference's
  tray force sensors are approximated from the tray's net contact
  force/torque split across the 3 sensor points (documented deviation; the
  sensors exist only as observation features).
- reward (:459-476): 1/(1+|ball - (0,0,0.7)|) * 1/(1+|ball vel|); reset on
  ball z < 1.5r or timeout.
- reset (:363-405): ball at random offset/height with inward velocity,
  bbot at default pose, zero dofs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.physics import builder as B
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.types import (
    DRIVE_NONE,
    DRIVE_POS,
    JT_FREE,
    JT_REVOLUTE,
    dof_pos,
    dof_vel,
    root_state,
    set_dof_state,
    set_root_state,
)


def _euler_zyx_quat(roll, pitch, yaw):
    """gymapi.Quat.from_euler_zyx equivalent (xyzw)."""
    cr, sr = math.cos(roll / 2), math.sin(roll / 2)
    cp, sp = math.cos(pitch / 2), math.sin(pitch / 2)
    cy, sy = math.cos(yaw / 2), math.sin(yaw / 2)
    return np.array(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ]
    )


def _quat_mat(q):
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def _build_balance_bot():
    """Mirror of _create_balance_bot_asset (ball_balance.py:136-231)."""
    tray_radius, tray_t = 0.5, 0.02
    leg_radius = 0.02
    leg_outer = tray_radius - 0.1
    leg_len = leg_outer - 2 * leg_radius
    leg_inner = leg_outer - leg_len / math.sqrt(2)
    tray_height = leg_len * math.sqrt(2) + 2 * leg_radius + 0.5 * tray_t

    mb = B.ModelBuilder()
    m_tray = 100.0 * math.pi * tray_radius**2 * tray_t
    tray = mb.add_body(
        "tray", -1, JT_FREE,
        mass=m_tray, inertia=B.cylinder_inertia(m_tray, tray_radius, tray_t),
    )
    mb.add_surface(
        tray, B.ModelBuilder.SURF_CYLINDER, (0, 0, 0), None,
        (tray_radius, 0.5 * tray_t, 0),
    )
    m_leg = 1000.0 * (math.pi * leg_radius**2 * leg_len + 4 / 3 * math.pi * leg_radius**3)

    angles = [0.0, 2.0 / 3.0 * math.pi, 4.0 / 3.0 * math.pi]
    anchors = []
    for i, ang in enumerate(angles):
        up_from = np.array(
            [leg_outer * math.cos(ang), leg_outer * math.sin(ang), -leg_radius - 0.5 * tray_t]
        )
        up_to = np.array(
            [leg_inner * math.cos(ang), leg_inner * math.sin(ang), up_from[2] - leg_len / math.sqrt(2)]
        )
        up_pos = (up_from + up_to) / 2
        up_quat = _euler_zyx_quat(0, -0.75 * math.pi, ang)
        upper = mb.add_body(
            f"upper_leg{i}", tray, JT_REVOLUTE,
            joint_pos=up_pos + _quat_mat(up_quat) @ np.array([0, 0, -0.5 * leg_len]),
            joint_quat=up_quat,
            joint_axis=(0, 1, 0),
            joint_name=f"upper_leg_joint{i}",
            mass=m_leg, inertia=B.capsule_inertia(m_leg, leg_radius, leg_len),
            lower=-math.pi / 4, upper=math.pi / 4, has_limit=True,
            drive_mode=DRIVE_NONE, stiffness=0.0, damping=0.0, effort=1e6,
        )
        # NOTE: body frame sits at the joint; geom center is +z/2 up the
        # capsule (the MJCF body origin is the capsule center with joint at
        # pos (0,0,-l/2); we put the body frame AT the joint instead)
        mb.add_surface(
            upper, B.ModelBuilder.SURF_CAPSULE, (0, 0, 0.5 * leg_len), None,
            (leg_radius, 0.5 * leg_len, 0),
        )
        low_quat = _euler_zyx_quat(0, -0.5 * math.pi, 0)
        low_pos_in_upper = np.array([-0.5 * leg_len, 0, 0.5 * leg_len]) + np.array(
            [0, 0, 0.5 * leg_len]
        )
        lower = mb.add_body(
            f"lower_leg{i}", upper, JT_REVOLUTE,
            joint_pos=low_pos_in_upper + _quat_mat(low_quat) @ np.array([0, 0, -0.5 * leg_len]),
            joint_quat=low_quat,
            joint_axis=(0, 1, 0),
            joint_name=f"lower_leg_joint{i}",
            mass=m_leg, inertia=B.capsule_inertia(m_leg, leg_radius, leg_len),
            lower=-70 * math.pi / 180, upper=math.pi / 2, has_limit=True,
            drive_mode=DRIVE_POS, stiffness=4000.0, damping=100.0, effort=1e6,
        )
        mb.add_surface(
            lower, B.ModelBuilder.SURF_CAPSULE, (0, 0, 0.5 * leg_len), None,
            (leg_radius, 0.5 * leg_len, 0),
        )
        # foot (the capsule's far end) pinned to the ground position
        # (ref attractor target, ball_balance.py:310-316)
        anchors.append(
            (
                lower,
                np.array([0, 0, leg_len]),
                np.array([leg_outer * math.cos(ang), leg_outer * math.sin(ang), leg_radius]),
            )
        )

    for body, off, target in anchors:
        mb.add_anchor(body, off, target)

    # ball: separate free actor (ref: create_sphere r=.1 density 200)
    r_ball = 0.1
    m_ball = 200.0 * 4 / 3 * math.pi * r_ball**3
    ball = mb.add_body(
        "ball", -1, JT_FREE, mass=m_ball, inertia=B.sphere_inertia(m_ball, r_ball)
    )
    mb.add_geom_sphere(ball, (0, 0, 0), r_ball)
    mb.add_surface(ball, B.ModelBuilder.SURF_SPHERE, (0, 0, 0), None, (r_ball, 0, 0))
    return mb, tray_height, leg_outer, angles


@register("BallBalance")
class BallBalance(TaskEnv):
    num_obs = 24
    num_actions = 3

    def __init__(self, cfg):
        super().__init__(cfg)
        self.action_speed_scale = float(cfg["env"].get("actionSpeedScale", 20.0))
        mb, self.tray_height, leg_outer, angles = _build_balance_bot()
        mb.gravity = np.array(self.gravity)
        self.model = mb.finalize()
        self.ball_radius = 0.1
        self.actuated = np.array(
            [i for i, n in enumerate(self.model.dof_names) if "lower" in n]
        )
        self.sensor_offsets = jnp.array(
            [[leg_outer * math.cos(a), leg_outer * math.sin(a), 0.0] for a in angles],
            jnp.float32,
        )
        self.tray_body = self.model.body_index("tray")
        # tray force sensor: joint reaction wrench (ref: ball_balance.py:271)
        if not self.model.sensor_body:
            self.model = self.model.replace(sensor_body=(self.tray_body,))
        self.ball_actor = 1

    def _initial_ts(self, key):
        return {"dof_targets": jnp.zeros((self.num_envs, len(self.actuated)))}

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        kd, kdir, kh, khs, kz = jax.random.split(key, 5)
        rs = root_state(m, state.sim)  # (N, 2, 13)

        tray_init = jnp.zeros((n, 13)).at[:, 6].set(1.0).at[:, 2].set(self.tray_height)
        dists = jax.random.uniform(kd, (n,), minval=0.001, maxval=0.5)
        theta = jax.random.uniform(kdir, (n,), minval=-math.pi, maxval=math.pi)
        dirs = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
        hpos = dists[:, None] * dirs
        speedscale = (dists - 0.001) / (0.5 - 0.001)
        hspeed = jax.random.uniform(khs, (n,), minval=0.0, maxval=5.0)
        hvel = -speedscale[:, None] * hspeed[:, None] * dirs
        zpos = jax.random.uniform(kh, (n,), minval=1.0, maxval=2.0)
        ball_init = (
            jnp.zeros((n, 13))
            .at[:, 6].set(1.0)
            .at[:, 0:2].set(hpos)
            .at[:, 2].set(zpos)
            .at[:, 7:9].set(hvel)
            .at[:, 9].set(-5.0)
        )
        new_rs = jnp.stack([tray_init, ball_init], axis=1)
        mm = mask[:, None, None]
        sim = set_root_state(m, state.sim, jnp.where(mm, new_rs, rs))
        sim = set_dof_state(
            m, sim,
            jnp.where(mask[:, None], 0.0, dof_pos(m, sim)),
            jnp.where(mask[:, None], 0.0, dof_vel(m, sim)),
        )
        ts = dict(state.ts)
        ts["dof_targets"] = jnp.where(mask[:, None], 0.0, ts["dof_targets"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    def _make_control(self, state, actions):
        m = self.model
        n = actions.shape[0]
        ts = dict(state.ts)
        lo = jnp.asarray(m.dof_lower)[self.actuated]
        hi = jnp.asarray(m.dof_upper)[self.actuated]
        targets = jnp.clip(
            ts["dof_targets"] + self.dt * self.action_speed_scale * actions, lo, hi
        )
        ts["dof_targets"] = targets
        full = jnp.zeros((n, m.nd)).at[:, self.actuated].set(targets)
        return (
            engine.Control.zero(m, n).replace(pos_target=full),
            state.replace(ts=ts),
        )

    def _sensor_obs(self, state):
        """Tray force sensors from the tray's joint reaction wrench split
        across the 3 mounting points (ref: ball_balance.py:268-273; the
        reference reads 3 PhysX force sensors on the tray)."""
        if state.sim.joint_wrench is not None:
            # body-frame force -> world for the lever arithmetic below
            fq = state.sim.body_quat[:, self.tray_body]
            from isaacgymenv_tpu.ops import maths as _m

            cf = _m.quat_rotate(fq, state.sim.joint_wrench[:, 0, 0:3]) / 3.0
        else:
            cf = state.sim.contact_force[:, self.tray_body] / 3.0  # per sensor
        quat = state.sim.body_quat[:, self.tray_body]
        from isaacgymenv_tpu.ops import maths

        torques = []
        for j in range(3):
            off_w = maths.quat_rotate(
                quat, jnp.broadcast_to(self.sensor_offsets[j], cf.shape)
            )
            torques.append(jnp.cross(off_w, cf))
        return cf, torques

    def _observations(self, state, actions):
        m = self.model
        rs = root_state(m, state.sim)
        ball = rs[:, self.ball_actor]
        dp = dof_pos(m, state.sim)[:, self.actuated]
        dv = dof_vel(m, state.sim)[:, self.actuated]
        f, torques = self._sensor_obs(state)
        return jnp.concatenate(
            [dp, dv, ball[:, 0:3], ball[:, 7:10], f / 20.0]
            + [t / 20.0 for t in torques],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        rs = root_state(self.model, state.sim)
        ball = rs[:, self.ball_actor]
        pos, vel = ball[:, 0:3], ball[:, 7:10]
        ball_dist = jnp.sqrt(
            pos[:, 0] ** 2 + (pos[:, 2] - 0.7) ** 2 + pos[:, 1] ** 2
        )
        ball_speed = jnp.linalg.norm(vel, axis=-1)
        reward = 1.0 / (1.0 + ball_dist) * (1.0 / (1.0 + ball_speed))
        done = (pos[:, 2] < self.ball_radius * 1.5) | (
            state.progress >= self.max_episode_length - 1
        )
        return state, reward, done, {}
