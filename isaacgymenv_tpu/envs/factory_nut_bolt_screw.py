"""FactoryTaskNutBoltScrew — grip a nut seated on a bolt and screw it down.

Behavioral spec (ref: tasks/factory/factory_task_nut_bolt_screw.py +
cfg/task/FactoryTaskNutBoltScrew.yaml):
- act (N, 12): fingertip pose deltas; `unidirectional_rot` remaps the z
  rotation action to [-1, 0] (screwing direction only, :253-255); force
  slots accepted for parity (z-only OSC in the reference,
  motion_ctrl_axes [0,0,1,0,0,1]).
- obs (N, 32): fingertip midpoint pos/quat/linvel/angvel + nut COM
  pos/quat/linvel/angvel, zero-padded to 32 (:131-150).
- reward (:167-175): -(nut-to-target + finger-to-nut keypoint distances)
  * keypoint_reward_scale - action penalty + success bonus, where each
  keypoint set is 4 points interpolated along a hand-length axis line
  (:289-336).
- done (:152-165): success = nut within one thread-pitch of its fully
  screwed-down height; failure = timeout OR nut farther than 0.1 m from
  target OR nut slipped out of the fingerpads.
- reset (:177-228): arm to initial dofs, fingers buffered at nut width;
  nut at the top of the bolt shank rotated 30 deg.

TPU-native thread model: the reference resolves the nut-bolt thread with
SDF mesh collisions (factory_base.py:483).  Here the nut rides a JT_SCREW
(helical) joint on the bolt — rotation about the bolt axis couples to
descent by thread_pitch/2pi, with thread friction as joint friction.  The
gripper rotates the nut through finger-pad contact friction on the hex
flats exactly as in the reference; only the thread constraint itself is
idealized (documented deviation; `is_fallen` cannot occur and is omitted).
M16 dimensions from assets/factory/yaml/factory_asset_info_nut_bolt.yaml.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import TaskEnv
from isaacgymenv_tpu.envs.factory_nut_bolt_pick import TABLE_H
from isaacgymenv_tpu.envs.franka_cube_stack import _add_box_actor
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import builder as B
from isaacgymenv_tpu.physics import dynamics, engine, kinematics
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    DRIVE_POS,
    JT_FIXED,
    JT_SCREW,
    dof_pos,
    dof_vel,
    set_dof_state,
)
from isaacgymenv_tpu.physics.urdf import AssetOptions, load_urdf
from isaacgymenv_tpu.utils.config import asset_root

# M16 + Franka dims (ref asset yamls)
NUT_WIDTH_MAX = 0.02771281
NUT_H = 0.013
NUT_R = NUT_WIDTH_MAX / 2.0
BOLT_HEAD_H = 0.016
BOLT_SHANK_L = 0.025
BOLT_WIDTH = 0.016
THREAD_PITCH = 0.002
HAND_L = 0.0584
FINGER_L = 0.053671
FINGERPAD_L = 0.017608
AXIS_LEN = HAND_L + FINGER_L
ARM_INIT = (1.5178e-03, -1.9651e-01, -1.4364e-03, -1.9761, -2.7717e-04, 1.7796, 7.8556e-01)
FINGER_BUFFER = NUT_WIDTH_MAX * 0.5 * 1.1


@register("FactoryTaskNutBoltScrew")
class FactoryTaskNutBoltScrew(TaskEnv):
    num_obs = 32
    num_actions = 12

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 1024)))
        super().__init__(cfg)
        rl = cfg.get("rl", {})
        rnd = cfg.get("randomize", {})
        self.pos_scale = jnp.asarray(rl.get("pos_action_scale", [0.1, 0.1, 0.1]))
        self.rot_scale = jnp.asarray(rl.get("rot_action_scale", [0.1, 0.1, 0.1]))
        self.clamp_rot_thresh = float(rl.get("clamp_rot_thresh", 1e-6))
        self.unidirectional_rot = bool(rl.get("unidirectional_rot", True))
        self.keypoint_reward_scale = float(rl.get("keypoint_reward_scale", 1.0))
        self.action_penalty_scale = float(rl.get("action_penalty_scale", 0.0))
        self.success_bonus = float(rl.get("success_bonus", 0.0))
        self.far_error_thresh = float(rl.get("far_error_thresh", 0.1))
        self.nut_rot_initial = float(rnd.get("nut_rot_initial", 30.0)) * math.pi / 180.0
        self._build_model(cfg)
        # target: nut fully screwed down (ref :90-91)
        self.target_z = TABLE_H + BOLT_HEAD_H + NUT_H * 0.5
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
                        DRIVE_POS, 100.0, 1.0, 200.0,
                    )  # ref ctrl.all gripper gains [100, 1]
                i += 1
        _add_box_actor(fb, "table", (0.6, 0.6, TABLE_H / 2), (0.0, 0.0, TABLE_H / 2), 100.0, fixed=True)
        # bolt: fixed body at the table center; shank surface for reference
        bolt = fb.add_body(
            "bolt", -1, JT_FIXED, joint_pos=(0.0, 0.0, TABLE_H),
            mass=0.1, inertia=B.cylinder_inertia(0.1, BOLT_WIDTH / 2, BOLT_HEAD_H),
        )
        fb.add_surface(
            bolt, B.ModelBuilder.SURF_CYLINDER, (0, 0, BOLT_HEAD_H / 2), None,
            (BOLT_WIDTH / 2, BOLT_HEAD_H / 2, 0),
        )
        # nut: JT_SCREW child of the bolt; q=0 -> z = table + shank (ref :202-210)
        m_nut = 7850.0 * math.pi * NUT_R**2 * NUT_H
        nut = fb.add_body(
            "nut", bolt, JT_SCREW, joint_pos=(0.0, 0.0, BOLT_SHANK_L),
            joint_axis=(0, 0, 1), pitch=THREAD_PITCH,
            mass=m_nut, inertia=B.cylinder_inertia(m_nut, NUT_R, NUT_H),
            friction=0.02,   # thread friction
            damping=0.005,
            lower=-200.0, upper=200.0,
        )
        fb.add_surface(nut, B.ModelBuilder.SURF_CYLINDER, (0, 0, 0), None, (NUT_R, NUT_H / 2, 0))
        for ang in np.linspace(0, 2 * math.pi, 6, endpoint=False):
            fb.add_geom_sphere(
                nut,
                (NUT_R * 0.7 * math.cos(ang), NUT_R * 0.7 * math.sin(ang), 0.0),
                NUT_H / 2 * 0.9,
                friction=1.5,
            )
        self.nut_body = nut
        fb.gravity = np.array(self.gravity)
        self.model = attach_effective_masses(fb.finalize())
        lb = finfo["link_body"]
        self.grip_body = lb["panda_grip_site"]
        self.arm_v_adr = np.arange(7)
        self.finger_dofs = np.arange(7, 9)
        self.screw_dof = self.model.nd - 1  # nut's helical dof (last added)
        self.effort_limit = jnp.asarray(self.model.dof_effort)[:7]
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)
        self.default_dof = jnp.array(
            list(ARM_INIT) + [FINGER_BUFFER] * 2 + [0.0], jnp.float32
        )

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {"successes": jnp.zeros(n)}

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        mm = mask[:, None]
        pos = jnp.broadcast_to(self.default_dof, (n, m.nd))
        # nut rotated 30 deg at the top of the shank (ref :202-210)
        pos = pos.at[:, self.screw_dof].set(self.nut_rot_initial)
        sim = set_dof_state(
            m, state.sim,
            jnp.where(mm, pos, dof_pos(m, state.sim)),
            jnp.where(mm, 0.0, dof_vel(m, state.sim)),
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

    def _nut_state(self, state):
        sim = state.sim
        b = self.nut_body
        return (
            sim.body_pos[:, b], sim.body_quat[:, b],
            sim.body_linvel[:, b], sim.body_angvel[:, b],
        )

    def _osc_to_pose(self, state, target_pos, target_quat, gripper):
        """Task-space pose servo (ref factory_control.py operational_space_motion)."""
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
        rot_a = actions[:, 3:6]
        if self.unidirectional_rot:
            rot_a = rot_a.at[:, 2].set(-(rot_a[:, 2] + 1.0) * 0.5)  # ref :253-255
        rot_a = rot_a * self.rot_scale
        angle = jnp.linalg.norm(rot_a, axis=-1)
        axis = rot_a / jnp.maximum(angle, 1e-9)[:, None]
        dq = maths.quat_from_angle_axis(angle, axis)
        dq = jnp.where(
            (angle > self.clamp_rot_thresh)[:, None],
            dq, jnp.zeros_like(dq).at[:, 3].set(1.0),
        )
        quat_t = maths.quat_mul(dq, eef_quat)
        gripper = jnp.zeros((actions.shape[0],))  # closed on the nut flats
        return self._osc_to_pose(state, pos_t, quat_t, gripper)

    # ------------------------------------------------------------------
    def _axis_keypoints(self, p1, p2):
        """4 points interpolated 0, 1/3, 2/3, 1 along p1->p2 (ref :325-336)."""
        fr = jnp.array([0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0])
        return p1[:, None] + (p2 - p1)[:, None] * fr[None, :, None]

    def _local_z(self, pos, quat, offset):
        z = jnp.zeros_like(pos).at[:, 2].set(offset)
        return pos + maths.quat_rotate(quat, z)

    def _keypoint_dists(self, state):
        grip_pos, grip_quat, _, _ = self._grip_state(state)
        nut_pos, nut_quat, _, _ = self._nut_state(state)
        n = grip_pos.shape[0]
        target = jnp.zeros((n, 3)).at[:, 2].set(self.target_z)

        # 'nut' line: nut COM up its axis vs target up world z (ref :296-311)
        kp_nut = self._axis_keypoints(
            nut_pos, self._local_z(nut_pos, nut_quat, AXIS_LEN)
        )
        kp_targ = self._axis_keypoints(
            target, target + jnp.array([0.0, 0.0, AXIS_LEN])
        )
        nut_kp_dist = jnp.linalg.norm(kp_targ - kp_nut, axis=-1).sum(-1)

        # 'finger_nut' line: fingerpad midpoint down the hand axis vs nut
        fingerpad_mid = self._local_z(
            grip_pos, grip_quat, -(FINGER_L - FINGERPAD_L * 0.5)
        )
        kp_fin = self._axis_keypoints(
            fingerpad_mid, self._local_z(fingerpad_mid, grip_quat, -AXIS_LEN)
        )
        kp_fin_targ = self._axis_keypoints(
            nut_pos, self._local_z(nut_pos, nut_quat, AXIS_LEN)
        )
        finger_nut_kp_dist = jnp.linalg.norm(kp_fin_targ - kp_fin, axis=-1).sum(-1)

        nut_dist_to_target = jnp.abs(nut_pos[:, 2] - self.target_z) + jnp.linalg.norm(
            nut_pos[:, 0:2], axis=-1
        )
        nut_dist_to_fingerpads = jnp.linalg.norm(fingerpad_mid - nut_pos, axis=-1)
        return nut_kp_dist, finger_nut_kp_dist, nut_dist_to_target, nut_dist_to_fingerpads

    def _observations(self, state, actions):
        eef_pos, eef_quat, eef_lin, eef_ang = self._grip_state(state)
        nut_pos, nut_quat, nut_lin, nut_ang = self._nut_state(state)
        obs26 = jnp.concatenate(
            [eef_pos, eef_quat, eef_lin, eef_ang, nut_pos, nut_quat, nut_lin, nut_ang],
            axis=-1,
        )
        pad = jnp.zeros((obs26.shape[0], self.num_obs - obs26.shape[-1]))
        return jnp.concatenate([obs26, pad], axis=-1)  # ref zero-pads to 32 (:149)

    def _reward_done(self, state, obs, actions):
        ts = dict(state.ts)
        nut_kp, fin_kp, dist_targ, dist_pads = self._keypoint_dists(state)
        success = dist_targ < THREAD_PITCH
        expired = state.progress >= self.max_episode_length
        far = dist_targ > self.far_error_thresh
        slipped = (dist_pads > FINGERPAD_L * 0.5 + NUT_H * 0.5) & ~success
        failure = expired | far | slipped
        reward = (
            -(nut_kp + fin_kp) * self.keypoint_reward_scale
            - jnp.linalg.norm(actions, axis=-1) * self.action_penalty_scale
            + success * self.success_bonus
        )
        done = success | failure
        ts["successes"] = jnp.where(done, success.astype(jnp.float32), ts["successes"])
        state = state.replace(ts=ts)
        info = {"episode": {"successes": ts["successes"].mean()}}
        return state, reward, done, info
