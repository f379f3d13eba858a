"""Fixed-base arm reach-to-random-target tasks with operational-space control.

Reproduces the fork's Houndarm (ref: tasks/hound_arm.py) and Manipulator
(ref: tasks/manipulator.py) — identical task logic, different arm asset:

- obs (N, 10): eef_pos(3) + eef_quat(4) + command(3)   (hound_arm.py:389-392)
- act (N, 6): task-space delta pose [dx,dy,dz,droll,dpitch,dyaw], scaled by
  cmd_limit [0.1,0.1,0.1,0.5,0.5,0.5] / action_scale   (hound_arm.py:168-169,505-515)
- OSC torque law (hound_arm.py:462-493): inertia-weighted task-space PD
  (kp=150, kd=2*sqrt(kp)) + nullspace posture control (kp_null=10) projected
  through (I - J^T (J M^-1 J^T)^-1 J M^-1), clipped at URDF effort limits.
  `joint_tor` control bypasses OSC and applies scaled joint torques directly.
- reward (hound_arm.py:551-567): r_dist*(1 - tanh(10*||eef-cmd||)) +
  r_vel*(1 - tanh(10*||eef_vel||)) gated on dist < 0.02; clipped >= 0.
- done: timeout only; reset resamples command + q = default + noise (clamped
  to limits), qd = 0 (hand_arm.py:398-430).
- asset loaded fix_base_link=True at (-0.45, 0, 0), gravity disabled
  (hound_arm.py:214-218) -> model.gravity = 0.

TPU-native notes: J (6, nv) and M (nv, nv) come from the analytic batched
kinematics/CRBA (physics/kinematics.py, physics/dynamics.py) instead of
PhysX's acquire_jacobian/mass_matrix tensors; the 6x6/7x7 inverses are
batched `jnp.linalg.solve`s, fused into the jitted step.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.physics import dynamics, engine, kinematics
from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    dof_pos,
    dof_vel,
    set_dof_state,
)
from isaacgymenv_tpu.physics.urdf import AssetOptions, load_urdf
from isaacgymenv_tpu.utils.config import asset_root


class _ArmReachBase(TaskEnv):
    """Shared OSC reach task; subclasses pin the asset + defaults."""

    num_obs = 10
    num_actions = 6

    # subclass-provided
    asset_file: str = ""
    eef_link: str = ""
    default_arm_pos: tuple = ()
    # trailing position-controlled dofs (e.g. Franka fingers; the reference
    # sets driveMode POS for i > 6, manipulator.py:224-230)
    finger_defaults: tuple = ()

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 150)))
        super().__init__(cfg)
        self.control_type = e.get("controlType", "osc")
        assert self.control_type in ("osc", "joint_tor")
        self.action_scale = float(e.get("actionScale", 1.0))
        self.dof_noise = float(e.get("armDofNoise", e.get("houndarmDofNoise", 0.25)))
        self.r_dist_scale = float(e.get("distRewardScale", 0.1))
        self.r_vel_scale = float(e.get("velRewardScale", 0.1))
        ranges = e["randomCommandPositionRanges"]
        self.cmd_ranges = np.array(
            [ranges["x"], ranges["y"], ranges["z"]], np.float32
        )  # (3, 2)

        self._build_model(cfg)
        self.na = len(self.default_arm_pos)  # arm dofs (OSC slice, ref mm[:, :na, :na])
        assert self.model.nd == self.na + len(self.finger_defaults)
        if self.control_type == "joint_tor":
            self.num_actions = self.na
        self.default_dof_pos = jnp.array(
            tuple(self.default_arm_pos) + tuple(self.finger_defaults), jnp.float32
        )
        self.default_arm = jnp.array(self.default_arm_pos, jnp.float32)
        # OSC gains (ref: hound_arm.py:160-166)
        self.kp = 150.0
        self.kd = 2.0 * np.sqrt(self.kp)
        self.kp_null = 10.0
        self.kd_null = 2.0 * np.sqrt(self.kp_null)
        self.cmd_limit = jnp.array([0.1, 0.1, 0.1, 0.5, 0.5, 0.5], jnp.float32)

    def _build_model(self, cfg):
        from isaacgymenv_tpu.physics.types import DRIVE_POS

        path = os.path.join(asset_root(), self.asset_file)
        mb, info = load_urdf(
            path,
            AssetOptions(
                fix_base_link=True,
                collapse_fixed_joints=False,
                default_dof_drive_mode=DRIVE_EFFORT,
                density=1000.0,  # gymapi.AssetOptions default (Franka has no inertials)
            ),
            base_pos=(-0.45, 0.0, 0.0),  # ref: hound_arm.py:263-265
        )
        n_arm = len(self.default_arm_pos)
        dof_i = 0
        for b in mb.bodies:
            if b.jtype not in (1, 2):  # revolute/prismatic only carry dofs
                continue
            if dof_i < n_arm:
                b.drive_mode = DRIVE_EFFORT
                b.stiffness = 0.0
                b.damping = 0.0
            else:  # fingers: position drive (ref: manipulator.py driveMode POS i>6)
                b.drive_mode = DRIVE_POS
                b.stiffness = 1000.0
                b.damping = 50.0
            dof_i += 1
        mb.gravity = np.zeros(3)  # disable_gravity=True (ref: hound_arm.py:218)
        self.model = mb.finalize()
        self._info = info
        self.eef_body = info["link_body"][self.eef_link]
        self.effort_limit = jnp.asarray(self.model.dof_effort)[: len(self.default_arm_pos)]

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "commands": jnp.zeros((n, 3)),
        }

    def _sample_commands(self, key, n):
        lo = jnp.asarray(self.cmd_ranges[:, 0])
        hi = jnp.asarray(self.cmd_ranges[:, 1])
        return jax.random.uniform(key, (n, 3), minval=lo, maxval=hi)

    def _reset_envs(self, state, mask, key):
        n = mask.shape[0]
        m = self.model
        k_cmd, k_q = jax.random.split(key)
        ts = dict(state.ts)
        ts["commands"] = jnp.where(
            mask[:, None], self._sample_commands(k_cmd, n), ts["commands"]
        )
        noise = jax.random.uniform(k_q, (n, m.nd))
        new_q = jnp.clip(
            self.default_dof_pos + self.dof_noise * 2.0 * (noise - 0.5),
            m.dof_lower,
            m.dof_upper,
        )
        mm = mask[:, None]
        sim = set_dof_state(
            m,
            state.sim,
            jnp.where(mm, new_q, dof_pos(m, state.sim)),
            jnp.where(mm, 0.0, dof_vel(m, state.sim)),
        )
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    # ------------------------------------------------------------------
    def _eef_state(self, state):
        sim = state.sim
        b = self.eef_body
        return (
            sim.body_pos[:, b],
            sim.body_quat[:, b],
            jnp.concatenate([sim.body_linvel[:, b], sim.body_angvel[:, b]], -1),
        )

    def _osc_torques(self, state, dpose):
        """Operational-space control (ref: _compute_osc_torques, hound_arm.py:462-493)."""
        m = self.model
        na = self.na
        q = dof_pos(m, state.sim)[:, :na]
        qd = dof_vel(m, state.sim)[:, :na]
        kin = kinematics.fk(m, state.sim.q, state.sim.qd)
        inertias = dynamics.body_spatial_inertias(m, (q.shape[0],), q.dtype)
        # arm block only (ref: mm[:, :na, :na], hound_arm.py:325-328)
        M = dynamics.crba(m, kin, inertias)[..., :na, :na]
        eef_pos = kin.p_w[self.eef_body]
        J = kinematics.body_jacobian(m, kin, self.eef_body, eef_pos)[..., :, :na]
        ang, lin = kinematics.world_velocities(m, kin)
        eef_vel = jnp.concatenate([lin[self.eef_body], ang[self.eef_body]], -1)

        eye = jnp.eye(na, dtype=q.dtype)
        Minv = jnp.linalg.solve(M + 1e-9 * eye, jnp.broadcast_to(eye, M.shape))
        m_eef_inv = J @ Minv @ jnp.swapaxes(J, -1, -2)  # (N, 6, 6)
        eye6 = jnp.eye(6, dtype=q.dtype)
        # damped least squares: bounded torques near kinematic singularities
        # (the reference's bare torch.inverse is unbounded there)
        m_eef = jnp.linalg.solve(m_eef_inv + 1e-2 * eye6, jnp.broadcast_to(eye6, m_eef_inv.shape))
        u = jnp.swapaxes(J, -1, -2) @ m_eef @ (
            self.kp * dpose - self.kd * eef_vel
        )[..., None]

        # nullspace posture control (ref: hound_arm.py:480-488)
        j_eef_inv = m_eef @ J @ Minv  # (N, 6, na)
        u_null = self.kd_null * -qd + self.kp_null * (
            jnp.mod(self.default_arm - q + jnp.pi, 2 * jnp.pi) - jnp.pi
        )
        u_null = M @ u_null[..., None]
        proj = jnp.broadcast_to(eye, M.shape) - jnp.swapaxes(J, -1, -2) @ j_eef_inv
        u = (u + proj @ u_null)[..., 0]
        return jnp.clip(u, -self.effort_limit, self.effort_limit)

    def _make_control(self, state, actions):
        n = actions.shape[0]
        if self.control_type == "osc":
            dpose = actions * self.cmd_limit / self.action_scale
            u = self._osc_torques(state, dpose)
        else:
            u = jnp.clip(
                actions * self.effort_limit / self.action_scale,
                -self.effort_limit,
                self.effort_limit,
            )
        # fingers (if any) hold their default position via PD drive
        effort = jnp.zeros((n, self.model.nd)).at[:, : self.na].set(u)
        targets = jnp.broadcast_to(self.default_dof_pos, (n, self.model.nd))
        return engine.Control.zero(self.model, n).replace(
            effort=effort, pos_target=targets
        )

    def _observations(self, state, actions):
        eef_pos, eef_quat, _ = self._eef_state(state)
        return jnp.concatenate([eef_pos, eef_quat, state.ts["commands"]], -1)

    def _reward_done(self, state, obs, actions):
        eef_pos, _, eef_vel = self._eef_state(state)
        cmd = state.ts["commands"]
        d = jnp.linalg.norm(eef_pos - cmd, axis=-1)
        dist_rew = 1.0 - jnp.tanh(10.0 * d)
        vel_rew = (1.0 - jnp.tanh(10.0 * jnp.linalg.norm(eef_vel, axis=-1))) * (
            d < 0.02
        )
        rew = jnp.clip(
            dist_rew * self.r_dist_scale + vel_rew * self.r_vel_scale, 0.0, None
        )
        done = state.progress >= self.max_episode_length - 1
        return state, rew, done, {"episode": {"dist": d.mean()}}


@register("Houndarm")
class Houndarm(_ArmReachBase):
    """6-DOF OpenManipulator-P reach (ref: tasks/hound_arm.py)."""

    asset_file = "urdf/open_manipulator_p_gazebo/urdf/open_manipulator_p.urdf"
    eef_link = "end_link"  # ref: hound_arm.py:295
    default_arm_pos = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)  # ref: hound_arm.py:157-159


@register("Manipulator")
class Manipulator(_ArmReachBase):
    """7-DOF Franka reach (ref: tasks/manipulator.py)."""

    # NOTE documented deviation: the reference points at
    # franka_panda_manipulator.urdf, which is malformed XML (nested comments
    # leave an orphaned </joint> at robots/franka_panda_manipulator.urdf:182-192)
    # and cannot be parsed by a conforming parser; franka_panda.urdf is the
    # same 7-DOF arm + hand/fingers and is well-formed, so we use it.
    asset_file = "urdf/franka_description/robots/franka_panda.urdf"
    eef_link = "panda_link7"  # ref: manipulator.py:285
    default_arm_pos = (0.0, 0.1963, 0.0, -2.6180, 0.0, 2.9416, 0.7854)
    finger_defaults = (0.035, 0.035)
