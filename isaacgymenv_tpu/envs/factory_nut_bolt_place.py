"""FactoryTaskNutBoltPlace — move a grasped nut onto the tip of a bolt.

Behavioral spec (ref: tasks/factory/factory_task_nut_bolt_place.py +
cfg/task/FactoryTaskNutBoltPlace.yaml):
- Gravity is DISABLED for this task (ref cfg `sim.disable_gravity: True`) —
  the nut rides in the closed gripper while the policy aligns it with the
  bolt tip.
- act (N, 12): fingertip-midpoint pose deltas (pos * 0.1, axis-angle rot
  * 0.1, clamped to identity below 1e-6); force/torque slots accepted for
  parity but unused; gripper is commanded CLOSED every step (:122-133).
- obs (N, 27): fingertip midpoint pos/quat/linvel/angvel + nut pos/quat +
  bolt pos/quat (:146-164; add_obs_bolt_tip_pos defaults False).
- reward (:180-196): -sum over 4 keypoints of |kp_nut - kp_bolt| where the
  keypoints run along a 0.5 m z-line through (nut frame + bolt_head_height
  z-offset) and (bolt frame + bolt_tip z-offset); action L2 penalty; at the
  final step success = summed keypoint distance < close_error_thresh (0.1)
  adds success_bonus and logs `successes` (:390-400).
- reset (:198-288): arm to franka_arm_initial_dof_pos, fingers buffered at
  nut_width_max*0.55; nut placed in the gripper (z noise 0.01) rotated yaw
  90deg; bolt on the table at (0,0) + XY noise 0.1.
- Deviations (documented): the bolt is a VIRTUAL target frame (no collision
  body) — with gravity off and the nut held in the gripper, bolt collision
  never participates in the reference reward either; the reference's
  scripted gripper-close + OSC gripper-pose randomization at reset is
  approximated by placing the nut between the fingers analytically (FK) and
  adding joint-space arm noise.  M16 dimensions from
  assets/factory/yaml/factory_asset_info_nut_bolt.yaml.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import TaskEnv
from isaacgymenv_tpu.envs.factory_nut_bolt_pick import (
    ARM_INIT as PICK_ARM_INIT,
    TABLE_H,
)
from isaacgymenv_tpu.envs.franka_cube_stack import _add_box_actor
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

# M16 asset constants (ref: assets/factory/yaml/factory_asset_info_nut_bolt.yaml)
NUT_WIDTH_MAX = 0.02771281
NUT_H = 0.013
NUT_R = NUT_WIDTH_MAX / 2.0
BOLT_HEAD_H = 0.016
BOLT_SHANK_L = 0.025
ARM_INIT = (0.00871, -0.10368, -0.00794, -1.49139, -0.00083, 1.38774, 0.7861)
FINGER_BUFFER = NUT_WIDTH_MAX * 0.5 * 1.1  # ref :225-227


@register("FactoryTaskNutBoltPlace")
class FactoryTaskNutBoltPlace(TaskEnv):
    num_obs = 27
    num_actions = 12

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 200)))
        super().__init__(cfg)
        rl = cfg.get("rl", {})
        rnd = cfg.get("randomize", {})
        self.pos_scale = jnp.asarray(rl.get("pos_action_scale", [0.1, 0.1, 0.1]))
        self.rot_scale = jnp.asarray(rl.get("rot_action_scale", [0.1, 0.1, 0.1]))
        self.clamp_rot_thresh = float(rl.get("clamp_rot_thresh", 1e-6))
        self.num_keypoints = int(rl.get("num_keypoints", 4))
        self.keypoint_scale = float(rl.get("keypoint_scale", 0.5))
        self.keypoint_reward_scale = float(rl.get("keypoint_reward_scale", 1.0))
        self.action_penalty_scale = float(rl.get("action_penalty_scale", 0.0))
        self.success_bonus = float(rl.get("success_bonus", 0.0))
        self.close_error_thresh = float(rl.get("close_error_thresh", 0.1))
        self.bolt_xy_initial = jnp.asarray(rnd.get("bolt_pos_xy_initial", [0.0, 0.0]))
        self.bolt_xy_noise = jnp.asarray(rnd.get("bolt_pos_xy_noise", [0.1, 0.1]))
        self.nut_z_noise = float(rnd.get("nut_noise_pos_in_gripper", [0, 0, 0.01])[2])
        self.nut_rot_noise = float(rnd.get("nut_noise_rot_in_gripper", 0.0))
        self._build_model(cfg)
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
                    b.drive_mode, b.stiffness, b.damping, b.effort = (
                        DRIVE_POS, 100.0, 2.0, 200.0,
                    )  # ref ctrl.all gripper gains [100, 2]
                i += 1
        _add_box_actor(fb, "table", (0.6, 0.6, TABLE_H / 2), (0.0, 0.0, TABLE_H / 2), 100.0, fixed=True)
        m_nut = 7850.0 * math.pi * NUT_R**2 * NUT_H
        nut = fb.add_body(
            "nut", -1, JT_FREE, mass=m_nut,
            inertia=B.cylinder_inertia(m_nut, NUT_R, NUT_H),
        )
        fb.add_surface(nut, B.ModelBuilder.SURF_CYLINDER, (0, 0, 0), None, (NUT_R, NUT_H / 2, 0))
        for ang in np.linspace(0, 2 * math.pi, 6, endpoint=False):
            fb.add_geom_sphere(
                nut,
                (NUT_R * 0.7 * math.cos(ang), NUT_R * 0.7 * math.sin(ang), 0.0),
                NUT_H / 2 * 0.9,
            )
        self.nut_body = nut
        fb.gravity = np.array(self.gravity)  # [0,0,0]: ref sim.disable_gravity
        self.model = attach_effective_masses(fb.finalize())
        lb = finfo["link_body"]
        self.grip_body = lb["panda_grip_site"]
        self.nut_actor = self.model.n_actors - 1
        self.arm_v_adr = np.arange(7)
        self.finger_dofs = np.arange(7, 9)
        self.effort_limit = jnp.asarray(self.model.dof_effort)[:7]
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)
        self.default_dof = jnp.array(list(ARM_INIT) + [FINGER_BUFFER] * 2, jnp.float32)

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "bolt_pos": jnp.zeros((n, 3)).at[:, 2].set(TABLE_H),
            "bolt_quat": jnp.zeros((n, 4)).at[:, 3].set(1.0),
            "successes": jnp.zeros(n),
        }

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        k_bolt, k_dof, k_nut, k_rot = jax.random.split(key, 4)
        mm = mask[:, None]
        # Franka: initial arm pose + joint noise (approximates the scripted
        # OSC gripper-pose randomization, ref :401+), fingers buffered open.
        pos = jnp.clip(
            self.default_dof
            + 0.1 * jax.random.uniform(k_dof, (n, 9), minval=-1.0, maxval=1.0)
            .at[:, 7:].set(0.0),
            self.dof_lower, self.dof_upper,
        )
        sim = set_dof_state(
            m, state.sim,
            jnp.where(mm, pos, dof_pos(m, state.sim)),
            jnp.where(mm, 0.0, dof_vel(m, state.sim)),
        )
        # nut into the gripper at the (new) fingertip midpoint (ref :238-262)
        q_new = sim.q
        kin = kinematics.fk(m, q_new, sim.qd)
        grip_pos = kin.p_w[self.grip_body]
        z_noise = self.nut_z_noise * jax.random.uniform(k_nut, (n,), minval=-1.0, maxval=1.0)
        yaw = (
            math.pi * 0.5
            + self.nut_rot_noise
            * jax.random.uniform(k_rot, (n,), minval=-1.0, maxval=1.0)
        )
        nut_quat = jnp.stack(
            [jnp.zeros(n), jnp.zeros(n), jnp.sin(yaw / 2), jnp.cos(yaw / 2)], -1
        )
        nut = (
            jnp.zeros((n, 13))
            .at[:, 0:3].set(grip_pos)
            .at[:, 2].add(z_noise - BOLT_HEAD_H)  # ref :245: z = fingertip - bolt_head_height
            .at[:, 3:7].set(nut_quat)
        )
        rs = root_state(m, sim)
        rs = rs.at[:, self.nut_actor].set(jnp.where(mm, nut, rs[:, self.nut_actor]))
        sim = set_root_state(m, sim, rs)
        # bolt: virtual frame on the table with XY noise (ref :264-276)
        bolt_xy = self.bolt_xy_initial + self.bolt_xy_noise * jax.random.uniform(
            k_bolt, (n, 2), minval=-1.0, maxval=1.0
        )
        bolt_pos = jnp.concatenate(
            [bolt_xy, jnp.full((n, 1), TABLE_H)], -1
        )
        ts = dict(state.ts)
        ts["bolt_pos"] = jnp.where(mm, bolt_pos, ts["bolt_pos"])
        ts["bolt_quat"] = jnp.where(
            mm, jnp.zeros((n, 4)).at[:, 3].set(1.0), ts["bolt_quat"]
        )
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
        """Task-space pose servo (ref factory_control.py joint_space_id)."""
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
        gripper = jnp.zeros((actions.shape[0],))  # always commanded closed (ref :131)
        return self._osc_to_pose(state, pos_t, quat_t, gripper)

    # ------------------------------------------------------------------
    def _keypoints(self, state):
        """World keypoints on the nut-base and bolt-tip lines (ref :108-121)."""
        rs = root_state(self.model, state.sim)[:, self.nut_actor]
        nut_pos, nut_quat = rs[:, 0:3], rs[:, 3:7]
        bolt_pos, bolt_quat = state.ts["bolt_pos"], state.ts["bolt_quat"]
        n = nut_pos.shape[0]
        base_local = jnp.array([0.0, 0.0, BOLT_HEAD_H])
        tip_local = jnp.array([0.0, 0.0, BOLT_HEAD_H + BOLT_SHANK_L])
        kp = jnp.broadcast_to(self.kp_offsets, (n,) + self.kp_offsets.shape)
        nq = jnp.broadcast_to(nut_quat[:, None], (n, self.num_keypoints, 4))
        bq = jnp.broadcast_to(bolt_quat[:, None], (n, self.num_keypoints, 4))
        kp_nut = nut_pos[:, None] + maths.quat_rotate(nq, kp + base_local)
        kp_bolt = bolt_pos[:, None] + maths.quat_rotate(bq, kp + tip_local)
        return kp_nut, kp_bolt, rs

    def _observations(self, state, actions):
        eef_pos, eef_quat, eef_lin, eef_ang = self._grip_state(state)
        rs = root_state(self.model, state.sim)[:, self.nut_actor]
        return jnp.concatenate(
            [
                eef_pos, eef_quat, eef_lin, eef_ang,
                rs[:, 0:3], rs[:, 3:7],
                state.ts["bolt_pos"], state.ts["bolt_quat"],
            ],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        ts = dict(state.ts)
        kp_nut, kp_bolt, _ = self._keypoints(state)
        kp_dist = jnp.linalg.norm(kp_bolt - kp_nut, axis=-1).sum(-1)
        reward = (
            -kp_dist * self.keypoint_reward_scale
            - jnp.linalg.norm(actions, axis=-1) * self.action_penalty_scale
        )
        timeout = state.progress >= self.max_episode_length - 1
        close = kp_dist < self.close_error_thresh
        reward = jnp.where(timeout, reward + close * self.success_bonus, reward)
        ts["successes"] = jnp.where(timeout, close.astype(jnp.float32), ts["successes"])
        state = state.replace(ts=ts)
        info = {"episode": {"successes": ts["successes"].mean()}}
        return state, reward, timeout, info
