"""FactoryTaskNutBoltPick — grasp a nut from the table and lift it.

Behavioral spec (ref: tasks/factory/factory_task_nut_bolt_pick.py +
factory_base.py/factory_control.py):
- Franka gripper on a table (top at 0.4 m); an M16-class nut spawned at
  (0, -0.3) + XY noise on the table; episode length 100, resets on timeout
  only (:175-186).
- act (N, 12): fingertip-midpoint pose deltas — pos * 0.1, axis-angle rot
  * 0.1 (clamped to identity below threshold); force/torque action slots
  accepted for parity but unused by the position controller (:292-333).
  The reference's joint_space_id inverse-dynamics controller is realized as
  the task-space OSC we use elsewhere (documented deviation).
- obs (N, 20): fingertip midpoint pos/quat/linvel/angvel + nut grasp
  pose (:158-171); nut grasp frame = nut frame shifted up by half height.
- reward (:188-203): -sum of distances between 4 keypoints spaced along a
  0.5 m line through the gripper frame and the nut grasp frame; at the
  final step the gripper is CLOSED and LIFTED open-loop (scripted physics
  inside the step, :146-150 -> lax.cond here) and lift success (nut 3x its
  height above the table) is logged.
- Deviations: the bolt (scenery for the pick task) and SDF meshes are not
  modeled — the nut is a procedural cylinder; the initial scripted
  gripper-pose randomization is approximated with joint-space noise.
  The remaining factory tasks (place/screw/insertion/gears) need
  tight-tolerance SDF contacts and stay deferred (FEATURES.md).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.franka_cube_stack import FRANKA_DEFAULT, _add_box_actor
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import builder as B
from isaacgymenv_tpu.physics import dynamics, engine, kinematics
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    DRIVE_POS,
    JT_FREE,
    dof_pos,
    dof_vel,
    root_state,
    set_dof_state,
    set_root_state,
)
from isaacgymenv_tpu.physics.urdf import AssetOptions, load_urdf
from isaacgymenv_tpu.utils.config import asset_root
import os

TABLE_H = 0.4
NUT_R, NUT_H = 0.012, 0.016
ARM_INIT = (0.3413, -0.8011, -0.0670, -1.8299, 0.0266, 1.0185, 1.0927)  # ref cfg :25
GRIPPER_MAX = 0.04


@register("FactoryTaskNutBoltPick")
class FactoryTaskNutBoltPick(TaskEnv):
    num_obs = 20
    num_actions = 12

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 100)))
        super().__init__(cfg)
        rl = cfg.get("rl", {})
        self.pos_scale = jnp.asarray(rl.get("pos_action_scale", [0.1, 0.1, 0.1]))
        self.rot_scale = jnp.asarray(rl.get("rot_action_scale", [0.1, 0.1, 0.1]))
        self.clamp_rot_thresh = float(rl.get("clamp_rot_thresh", 1e-6))
        self.num_keypoints = int(rl.get("num_keypoints", 4))
        self.keypoint_scale = float(rl.get("keypoint_scale", 0.5))
        self.keypoint_reward_scale = float(rl.get("keypoint_reward_scale", 1.0))
        self.action_penalty_scale = float(rl.get("action_penalty_scale", 0.0))
        self.success_bonus = float(rl.get("success_bonus", 0.0))
        self.close_and_lift = bool(e.get("close_and_lift", True))
        self.close_steps = int(e.get("num_gripper_close_sim_steps", 25))
        self.lift_steps = int(e.get("num_gripper_lift_sim_steps", 25))
        self._build_model(cfg)
        # uniformly-spaced keypoints along a unit z line (ref :335-341)
        z = np.linspace(0.0, 1.0, self.num_keypoints) - 0.5
        self.kp_offsets = jnp.array(
            np.stack([np.zeros_like(z), np.zeros_like(z), z], -1) * self.keypoint_scale
        )
        self.kp, self.kd = 150.0, 2.0 * np.sqrt(150.0)
        self.kp_null, self.kd_null = 10.0, 2.0 * np.sqrt(10.0)

    def _build_model(self, cfg):
        fb, finfo = load_urdf(
            os.path.join(
                asset_root(), "urdf/franka_description/robots/franka_panda_gripper.urdf"
            ),
            AssetOptions(fix_base_link=True, collapse_fixed_joints=False, density=1000.0),
            base_pos=(-0.45, 0.0, TABLE_H),
        )
        i = 0
        for b in fb.bodies:
            b.gravcomp = 1.0
            if b.jtype in (1, 2):
                if i < 7:
                    b.drive_mode, b.stiffness, b.damping = DRIVE_EFFORT, 0.0, 0.0
                else:
                    b.drive_mode, b.stiffness, b.damping, b.effort = DRIVE_POS, 5000.0, 100.0, 200.0
                i += 1
        _add_box_actor(fb, "table", (0.6, 0.6, TABLE_H / 2), (0.0, 0.0, TABLE_H / 2), 100.0, fixed=True)
        # nut: procedural cylinder
        m_nut = 7850.0 * math.pi * NUT_R**2 * NUT_H
        nut = fb.add_body(
            "nut", -1, JT_FREE, mass=m_nut,
            inertia=B.cylinder_inertia(m_nut, NUT_R, NUT_H),
        )
        fb.add_surface(nut, B.ModelBuilder.SURF_CYLINDER, (0, 0, 0), None, (NUT_R, NUT_H / 2, 0))
        for ang in np.linspace(0, 2 * math.pi, 6, endpoint=False):
            fb.add_geom_sphere(nut, (NUT_R * 0.7 * math.cos(ang), NUT_R * 0.7 * math.sin(ang), 0.0), NUT_H / 2 * 0.9)
        self.nut_body = nut
        fb.gravity = np.array(self.gravity)
        self.model = attach_effective_masses(fb.finalize())
        lb = finfo["link_body"]
        self.grip_body = lb["panda_grip_site"]
        self.lf_body = lb["panda_leftfinger_tip"]
        self.rf_body = lb["panda_rightfinger_tip"]
        self.nut_actor = self.model.n_actors - 1
        self.arm_v_adr = np.arange(7)
        self.finger_dofs = np.arange(7, 9)
        self.effort_limit = jnp.asarray(self.model.dof_effort)[:7]
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)
        self.default_dof = jnp.array(list(ARM_INIT) + [GRIPPER_MAX] * 2, jnp.float32)

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "actions": jnp.zeros((n, 12)),
            "target_pos": jnp.zeros((n, 3)),
            "target_quat": jnp.zeros((n, 4)).at[:, 3].set(1.0),
            "gripper_target": jnp.full((n,), GRIPPER_MAX),
            "successes": jnp.zeros(n),
        }

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        k_nut, k_dof = jax.random.split(key)
        mm = mask[:, None]
        noise = 0.1 * jax.random.uniform(k_nut, (n, 2), minval=-1.0, maxval=1.0)
        nut = (
            jnp.zeros((n, 13))
            .at[:, 0].set(0.0 + noise[:, 0])
            .at[:, 1].set(-0.3 + noise[:, 1])
            .at[:, 2].set(TABLE_H + NUT_H / 2 + 0.001)
            .at[:, 6].set(1.0)
        )
        rs = root_state(m, state.sim)
        rs = rs.at[:, self.nut_actor].set(jnp.where(mm, nut, rs[:, self.nut_actor]))
        sim = set_root_state(m, state.sim, rs)
        # initial gripper-pose randomization approximated in joint space
        pos = jnp.clip(
            self.default_dof
            + 0.1 * jax.random.uniform(k_dof, (n, 9), minval=-1.0, maxval=1.0)
            .at[:, 7:].set(0.0),
            self.dof_lower, self.dof_upper,
        )
        sim = set_dof_state(
            m, sim,
            jnp.where(mm, pos, dof_pos(m, sim)),
            jnp.where(mm, 0.0, dof_vel(m, sim)),
        )
        ts = dict(state.ts)
        ts["successes"] = jnp.where(mask, 0.0, ts["successes"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    # ------------------------------------------------------------------
    def _grip_state(self, state):
        sim = state.sim
        b = self.grip_body
        return (
            sim.body_pos[:, b], sim.body_quat[:, b],
            sim.body_linvel[:, b], sim.body_angvel[:, b],
        )

    def _osc_to_pose(self, state, target_pos, target_quat, gripper):
        """Task-space pose servo (realizes the reference's joint_space_id
        pose-tracking controller, factory_control.py)."""
        m = self.model
        q = dof_pos(m, state.sim)[:, :7]
        qd = dof_vel(m, state.sim)[:, :7]
        kin = kinematics.fk(m, state.sim.q, state.sim.qd)
        inertias = dynamics.body_spatial_inertias(m, (q.shape[0],), q.dtype)
        av = self.arm_v_adr
        M = dynamics.crba(m, kin, inertias)[..., av, :][..., :, av]
        eef_pos = kin.p_w[self.grip_body]
        J = kinematics.body_jacobian(m, kin, self.grip_body, eef_pos)[..., :, av]
        ang, lin = kinematics.world_velocities(m, kin)
        eef_vel = jnp.concatenate([lin[self.grip_body], ang[self.grip_body]], -1)
        eef_quat = state.sim.body_quat[:, self.grip_body]

        pos_err = target_pos - eef_pos
        q_err = maths.quat_mul(target_quat, maths.quat_conjugate(eef_quat))
        # axis-angle error (shortest path)
        sign = jnp.sign(q_err[..., 3:4])
        rot_err = 2.0 * q_err[..., 0:3] * sign
        dpose = jnp.concatenate([pos_err, rot_err], -1)

        eye = jnp.eye(7, dtype=q.dtype)
        eye6 = jnp.eye(6, dtype=q.dtype)
        Minv = jnp.linalg.solve(M + 1e-9 * eye, jnp.broadcast_to(eye, M.shape))
        m_eef_inv = J @ Minv @ jnp.swapaxes(J, -1, -2)
        m_eef = jnp.linalg.solve(m_eef_inv + 1e-2 * eye6, jnp.broadcast_to(eye6, m_eef_inv.shape))
        u = jnp.swapaxes(J, -1, -2) @ m_eef @ (self.kp * dpose - self.kd * eef_vel)[..., None]
        u_null = self.kd_null * -qd + self.kp_null * (
            jnp.mod(jnp.array(ARM_INIT) - q + jnp.pi, 2 * jnp.pi) - jnp.pi
        )
        u_null = M @ u_null[..., None]
        j_eef_inv = m_eef @ J @ Minv
        proj = jnp.broadcast_to(eye, M.shape) - jnp.swapaxes(J, -1, -2) @ j_eef_inv
        u = jnp.clip((u + proj @ u_null)[..., 0], -self.effort_limit, self.effort_limit)

        n = q.shape[0]
        effort = jnp.zeros((n, m.nd)).at[:, :7].set(u)
        targets = jnp.zeros((n, m.nd)).at[:, self.finger_dofs].set(gripper[:, None])
        return engine.Control.zero(m, n).replace(effort=effort, pos_target=targets)

    def _make_control(self, state, actions):
        ts = dict(state.ts)
        eef_pos, eef_quat, _, _ = self._grip_state(state)
        pos_t = eef_pos + actions[:, 0:3] * self.pos_scale
        rot_a = actions[:, 3:6] * self.rot_scale
        angle = jnp.linalg.norm(rot_a, axis=-1)
        axis = rot_a / jnp.maximum(angle, 1e-9)[:, None]
        dq = maths.quat_from_angle_axis(angle, axis)
        dq = jnp.where(
            (angle > self.clamp_rot_thresh)[:, None],
            dq, jnp.zeros_like(dq).at[:, 3].set(1.0),
        )
        quat_t = maths.quat_mul(dq, eef_quat)
        ts["target_pos"], ts["target_quat"] = pos_t, quat_t
        ts["actions"] = actions
        gripper = jnp.full((actions.shape[0],), GRIPPER_MAX)
        return self._osc_to_pose(state, pos_t, quat_t, gripper), state.replace(ts=ts)

    def _post_physics(self, state, actions):
        """Scripted close-and-lift at the final policy step (ref :146-150)."""
        if not self.close_and_lift:
            return state
        is_last = jnp.all(state.progress >= self.max_episode_length - 2)

        def do_script(sim):
            s = state.replace(sim=sim)
            eef_pos, eef_quat, _, _ = self._grip_state(s)
            closed = jnp.zeros((self.num_envs,))
            ctrl_close = self._osc_to_pose(s, eef_pos, eef_quat, closed)
            h = self.dt

            def close_body(_, sim):
                return engine.step(self.model, self.terrain, sim, ctrl_close, h, self.substeps)

            sim = jax.lax.fori_loop(0, self.close_steps, close_body, sim)
            s = state.replace(sim=engine.forward(self.model, self.terrain, sim))
            eef_pos2, eef_quat2, _, _ = self._grip_state(s)
            lift_target = eef_pos2.at[:, 2].add(0.3)
            ctrl_lift = self._osc_to_pose(s, lift_target, eef_quat2, closed)

            def lift_body(_, sim):
                return engine.step(self.model, self.terrain, sim, ctrl_lift, h, self.substeps)

            return jax.lax.fori_loop(0, self.lift_steps, lift_body, sim)

        sim = jax.lax.cond(is_last, do_script, lambda s: s, state.sim)
        return state.replace(sim=engine.forward(self.model, self.terrain, sim))

    # ------------------------------------------------------------------
    def _nut_grasp(self, state):
        rs = root_state(self.model, state.sim)[:, self.nut_actor]
        grasp_pos = rs[:, 0:3].at[:, 2].add(NUT_H / 2)
        return grasp_pos, rs[:, 3:7], rs

    def _observations(self, state, actions):
        eef_pos, eef_quat, eef_lin, eef_ang = self._grip_state(state)
        grasp_pos, grasp_quat, _ = self._nut_grasp(state)
        return jnp.concatenate(
            [eef_pos, eef_quat, eef_lin, eef_ang, grasp_pos, grasp_quat], axis=-1
        )

    def _reward_done(self, state, obs, actions):
        ts = dict(state.ts)
        eef_pos, eef_quat, _, _ = self._grip_state(state)
        grasp_pos, grasp_quat, nut_rs = self._nut_grasp(state)
        n = eef_pos.shape[0]
        kp = jnp.broadcast_to(self.kp_offsets, (n,) + self.kp_offsets.shape)
        eq = jnp.broadcast_to(eef_quat[:, None], (n, self.num_keypoints, 4))
        gq = jnp.broadcast_to(grasp_quat[:, None], (n, self.num_keypoints, 4))
        kp_grip = eef_pos[:, None] + maths.quat_rotate(eq, kp)
        kp_nut = grasp_pos[:, None] + maths.quat_rotate(gq, kp)
        kp_dist = jnp.linalg.norm(kp_nut - kp_grip, axis=-1).sum(-1)
        reward = (
            -kp_dist * self.keypoint_reward_scale
            - jnp.linalg.norm(actions, axis=-1) * self.action_penalty_scale
        )
        timeout = state.progress >= self.max_episode_length - 1
        lift_success = nut_rs[:, 2] > TABLE_H + NUT_H * 3.0
        reward = jnp.where(timeout, reward + lift_success * self.success_bonus, reward)
        ts["successes"] = jnp.where(timeout, lift_success.astype(jnp.float32), ts["successes"])
        state = state.replace(ts=ts)
        info = {"episode": {"successes": ts["successes"].mean()}}
        return state, reward, timeout, info
