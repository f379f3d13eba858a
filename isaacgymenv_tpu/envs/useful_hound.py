"""UsefulHound — loco-manipulation flagship: Hound quadruped + 6-DOF arm.

Behavioral spec (ref: tasks/useful_hound.py, cfg/task/UsefulHound.yaml):
- one articulation, urdf/UsefulHound/urdf/Hound.urdf: trunk + 4 legs
  (12 dofs) + arm link1..link6/end_link (6 dofs); legs PD-torque controlled
  (Kp80/Kd2, clip +-80, useful_hound.py:712-713), arm OSC torques
  (kp150/kd=2*sqrt(kp), nullspace kp10; :660-691), both held across the
  4-step decimation loop (:695-725).
- obs (N, 204): the 188-dim terrain layout with 18-dim actions
  [lin3, ang3, grav3, cmd3, leg dofpos 12, leg dofvel 12, heights 140,
  actions 18] + eef pos3 + eef quat4 + arm commands 3 (:485-497).
- act (N, 18): 12 leg position offsets + 6 arm task-space deltas scaled by
  arm_cmd_limit [0.1,0.1,0.1,0.5,0.5,0.5] (:703-705).
- reward: the 13 terrain terms, base height target 0.52, collision counts
  knee AND shoulder contacts (:523-525); termination on trunk OR knee OR
  shoulder contact OR timeout (:468-473, unconditional knee term).
- arm commands are never resampled (reference keeps them zero,
  useful_hound.py:591-593) — replicated.
- KNOWN REFERENCE BUG fixed here (documented deviation): the reference
  slices jacobian columns [:6] (useful_hound.py:451), which for a floating
  base articulation are the BASE columns, not the arm's; and its OSC reuses
  a jacobian refreshed only in post_physics within the decimation loop
  (:715, SURVEY.md quirks).  We use the arm's actual jacobian columns,
  computed fresh each control step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.anymal_terrain import REW_TERMS, AnymalTerrain
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.physics import dynamics, engine, kinematics
from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    DRIVE_POS,
    dof_pos,
    dof_vel,
    set_dof_state,
)
from isaacgymenv_tpu.ops import maths


@register("UsefulHound")
class UsefulHound(AnymalTerrain):
    num_obs = 204
    num_actions = 18
    base_height_target = 0.52  # ref: useful_hound.py:514

    def __init__(self, cfg):
        ua = cfg["env"].setdefault("urdfAsset", {})
        ua.setdefault("file", "urdf/UsefulHound/urdf/Hound.urdf")
        ua.setdefault("footName", "foot")
        ua.setdefault("kneeName", "thigh")
        ua.setdefault("baseName", "trunk")
        ua.setdefault("collapseFixedJoints", False)
        e = cfg["env"]
        self.arm_action_scale = float(
            e.get("control", {}).get("houndarmactionScale", 1.0)
        )
        self.arm_dof_noise = float(e.get("houndarmDofNoise", 0.25))
        super().__init__(cfg)

        names = self.model.body_names
        self.shoulder_indices = np.array(
            [i for i, n in enumerate(names) if "shoulder" in n]
        )
        self.eef_body = self._info["link_body"]["end_link"]
        dn = self.model.dof_names
        self.leg_dofs = np.array(
            [i for i, n in enumerate(dn) if ("roll" in n or "hip" in n or "knee" in n)]
        )
        self.arm_dofs = np.array([i for i, n in enumerate(dn) if n.startswith("joint")])
        assert len(self.leg_dofs) == 12 and len(self.arm_dofs) == 6, (dn,)
        self.hip_dofs = np.array([i for i, n in enumerate(dn) if "roll" in n])
        self.arm_v_adr = np.array(
            [self.model.dof_v_adr[d] for d in self.arm_dofs]
        )
        self.arm_effort_limit = jnp.asarray(self.model.dof_effort)[self.arm_dofs]
        self.leg_default = self.default_dof_pos[self.leg_dofs]
        self.arm_default = self.default_dof_pos[self.arm_dofs]
        # arm OSC gains (ref: useful_hound.py:238-245)
        self.arm_kp, self.arm_kd = 150.0, 2.0 * np.sqrt(150.0)
        self.arm_kp_null, self.arm_kd_null = 10.0, 2.0 * np.sqrt(10.0)
        self.arm_cmd_limit = jnp.array([0.1, 0.1, 0.1, 0.5, 0.5, 0.5], jnp.float32)

    def _configure_drives(self, mb):
        """Legs: PD position drive (torque clip 80); arm: direct effort with
        URDF limits (ref: useful_hound.py:370-380 drive modes)."""
        for b in mb.bodies:
            if b.jtype not in (1, 2):
                continue
            if b.joint_name.startswith("joint"):  # arm
                b.drive_mode = DRIVE_EFFORT
                b.stiffness = 0.0
                b.damping = 0.0
            else:  # legs
                b.drive_mode = DRIVE_POS
                b.stiffness = self.Kp
                b.damping = self.Kd
                b.effort = 80.0

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        ts = super()._initial_ts(key)
        ts["arm_commands"] = jnp.zeros((self.num_envs, 3))
        return ts

    def _reset_envs(self, state, mask, key):
        state = super()._reset_envs(state, mask, key)
        # arm dofs: default + uniform noise clipped to limits, zero vel
        # (ref: useful_hound.py:594-601; super() set them to default*U(.5,1.5))
        m = self.model
        k_arm = jax.random.fold_in(key, 11)
        n = mask.shape[0]
        noise = jax.random.uniform(k_arm, (n, 6))
        arm_pos = jnp.clip(
            self.arm_default + self.arm_dof_noise * 2.0 * (noise - 0.5),
            jnp.asarray(m.dof_lower)[self.arm_dofs],
            jnp.asarray(m.dof_upper)[self.arm_dofs],
        )
        dp = dof_pos(m, state.sim)
        dv = dof_vel(m, state.sim)
        mm = mask[:, None]
        dp = dp.at[:, self.arm_dofs].set(jnp.where(mm, arm_pos, dp[:, self.arm_dofs]))
        dv = dv.at[:, self.arm_dofs].set(jnp.where(mm, 0.0, dv[:, self.arm_dofs]))
        return state.replace(sim=set_dof_state(m, state.sim, dp, dv))

    # ------------------------------------------------------------------
    def _osc_torques(self, state, dpose):
        """Arm OSC (ref: useful_hound.py:660-691, with the jacobian-slice
        bug fixed — see module docstring)."""
        m = self.model
        q = dof_pos(m, state.sim)[:, self.arm_dofs]
        qd = dof_vel(m, state.sim)[:, self.arm_dofs]
        kin = kinematics.fk(m, state.sim.q, state.sim.qd)
        inertias = dynamics.body_spatial_inertias(m, (q.shape[0],), q.dtype)
        Mfull = dynamics.crba(m, kin, inertias)
        av = self.arm_v_adr
        M = Mfull[..., av, :][..., :, av]  # (N, 6, 6) arm block (ref mm[:,-6:,-6:])
        eef_pos = kin.p_w[self.eef_body]
        J = kinematics.body_jacobian(m, kin, self.eef_body, eef_pos)[..., :, av]
        ang, lin = kinematics.world_velocities(m, kin)
        eef_vel = jnp.concatenate([lin[self.eef_body], ang[self.eef_body]], -1)

        eye = jnp.eye(6, dtype=q.dtype)
        Minv = jnp.linalg.solve(M + 1e-9 * eye, jnp.broadcast_to(eye, M.shape))
        m_eef_inv = J @ Minv @ jnp.swapaxes(J, -1, -2)
        # damped least squares: the arm passes near singular configurations
        # (default pose is one); bare inversion (reference torch.inverse)
        # produces unbounded torques there.
        m_eef = jnp.linalg.solve(
            m_eef_inv + 1e-2 * eye, jnp.broadcast_to(eye, m_eef_inv.shape)
        )
        u = jnp.swapaxes(J, -1, -2) @ m_eef @ (
            self.arm_kp * dpose - self.arm_kd * eef_vel
        )[..., None]
        j_eef_inv = m_eef @ J @ Minv
        u_null = self.arm_kd_null * -qd + self.arm_kp_null * (
            jnp.mod(self.arm_default - q + jnp.pi, 2 * jnp.pi) - jnp.pi
        )
        u_null = M @ u_null[..., None]
        proj = jnp.broadcast_to(eye, M.shape) - jnp.swapaxes(J, -1, -2) @ j_eef_inv
        u = (u + proj @ u_null)[..., 0]
        return jnp.clip(u, -self.arm_effort_limit, self.arm_effort_limit)

    def _make_control(self, state, actions):
        n = actions.shape[0]
        targets = jnp.zeros((n, self.model.nd))
        targets = targets.at[:, self.leg_dofs].set(
            self.action_scale * actions[:, :12] + self.leg_default
        )
        dpose = actions[:, 12:] * self.arm_cmd_limit / self.arm_action_scale
        u_arm = self._osc_torques(state, dpose)
        effort = jnp.zeros((n, self.model.nd)).at[:, self.arm_dofs].set(u_arm)
        return engine.Control.zero(self.model, n).replace(
            pos_target=targets, effort=effort
        )

    # ------------------------------------------------------------------
    def _observations(self, state, actions):
        m = self.model
        heights, rs = self._measured_heights(state)
        base_quat = rs[:, 3:7]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, rs[:, 7:10])
        base_ang_vel = maths.quat_rotate_inverse(base_quat, rs[:, 10:13])
        projected_gravity = maths.quat_rotate_inverse(
            base_quat,
            jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), base_quat.shape[:-1] + (3,)),
        )
        height_obs = (
            jnp.clip(rs[:, 2:3] - 0.5 - heights, -1.0, 1.0) * self.height_meas_scale
        )
        cmd_scale = jnp.array(
            [self.lin_vel_scale, self.lin_vel_scale, self.ang_vel_scale]
        )
        dp = dof_pos(m, state.sim)[:, self.leg_dofs]
        dv = dof_vel(m, state.sim)[:, self.leg_dofs]
        eef_pos = state.sim.body_pos[:, self.eef_body]
        eef_quat = state.sim.body_quat[:, self.eef_body]
        return jnp.concatenate(
            [
                base_lin_vel * self.lin_vel_scale,
                base_ang_vel * self.ang_vel_scale,
                projected_gravity,
                state.ts["commands"][:, :3] * cmd_scale,
                dp * self.dof_pos_scale,
                dv * self.dof_vel_scale,
                height_obs,
                state.ts["actions"],
                eef_pos,
                eef_quat,
                state.ts["arm_commands"],
            ],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        m = self.model
        ts = state.ts
        from isaacgymenv_tpu.physics.types import root_state

        rs = root_state(m, state.sim)[:, 0]
        base_quat = rs[:, 3:7]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, rs[:, 7:10])
        base_ang_vel = maths.quat_rotate_inverse(base_quat, rs[:, 10:13])
        projected_gravity = maths.quat_rotate_inverse(
            base_quat,
            jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), base_quat.shape[:-1] + (3,)),
        )
        commands = ts["commands"]
        dp_legs = dof_pos(m, state.sim)[:, self.leg_dofs]
        dv_legs = dof_vel(m, state.sim)[:, self.leg_dofs]
        torques = state.sim.dof_force  # full 18 (ref: self.torques cat'd, :714)
        cf = state.sim.contact_force
        S = self.rew_scales

        lin_vel_error = jnp.sum(
            jnp.square(commands[:, :2] - base_lin_vel[:, :2]), axis=1
        )
        ang_vel_error = jnp.square(commands[:, 2] - base_ang_vel[:, 2])
        r = {}
        r["lin_vel_xy"] = jnp.exp(-lin_vel_error / 0.25) * S["lin_vel_xy"]
        r["ang_vel_z"] = jnp.exp(-ang_vel_error / 0.25) * S["ang_vel_z"]
        r["lin_vel_z"] = jnp.square(base_lin_vel[:, 2]) * S["lin_vel_z"]
        r["ang_vel_xy"] = (
            jnp.sum(jnp.square(base_ang_vel[:, :2]), axis=1) * S["ang_vel_xy"]
        )
        r["orient"] = (
            jnp.sum(jnp.square(projected_gravity[:, :2]), axis=1) * S["orient"]
        )
        r["base_height"] = (
            jnp.square(rs[:, 2] - self.base_height_target) * S["base_height"]
        )
        r["torques"] = jnp.sum(jnp.square(torques), axis=1) * S["torques"]
        r["joint_acc"] = (
            jnp.sum(
                jnp.square(ts["last_dof_vel"][:, self.leg_dofs] - dv_legs), axis=1
            )
            * S["joint_acc"]
        )

        knee_contact = jnp.linalg.norm(cf[:, self.knee_indices], axis=-1) > 1.0
        shoulder_contact = (
            jnp.linalg.norm(cf[:, self.shoulder_indices], axis=-1) > 1.0
        )
        # collision counts knees AND shoulders (ref: useful_hound.py:523-525)
        r["collision"] = (
            jnp.sum(knee_contact, axis=1) + jnp.sum(shoulder_contact, axis=1)
        ).astype(jnp.float32) * S["collision"]

        feet_cf = cf[:, self.feet_indices]
        stumble = (jnp.linalg.norm(feet_cf[..., :2], axis=-1) > 5.0) & (
            jnp.abs(feet_cf[..., 2]) < 1.0
        )
        r["stumble"] = jnp.sum(stumble, axis=1).astype(jnp.float32) * S["stumble"]
        r["action_rate"] = (
            jnp.sum(jnp.square(ts["last_actions"] - ts["actions"]), axis=1)
            * S["action_rate"]
        )

        contact = feet_cf[..., 2] > 1.0
        air = ts["feet_air_time"]
        first_contact = (air > 0.0) & contact
        air = air + self.dt
        rew_air = jnp.sum((air - 0.5) * first_contact, axis=1) * S["air_time"]
        rew_air = rew_air * (jnp.linalg.norm(commands[:, :2], axis=1) > 0.1)
        r["air_time"] = rew_air
        air = air * (~contact)

        r["hip"] = (
            jnp.sum(
                jnp.abs(
                    dof_pos(m, state.sim)[:, self.hip_dofs]
                    - self.default_dof_pos[self.hip_dofs]
                ),
                axis=1,
            )
            * S["hip"]
        )

        total = jnp.clip(sum(r.values()), 0.0, None)

        # termination: trunk OR knee OR shoulder contact OR timeout
        # (ref: check_termination, useful_hound.py:468-473)
        base_contact = jnp.linalg.norm(cf[:, self.base_index], axis=-1) > 1.0
        done = (
            base_contact
            | jnp.any(knee_contact, axis=1)
            | jnp.any(shoulder_contact, axis=1)
        )
        timeout = state.progress >= self.max_episode_length - 1
        done = done | timeout
        total = total + S["termination"] * (done & ~timeout)

        ts = dict(ts)
        ts["feet_air_time"] = air
        ts["last_actions"] = ts["actions"]
        ts["last_dof_vel"] = dof_vel(m, state.sim)
        info = {}
        n_done = jnp.maximum(done.sum(), 1)
        for k in REW_TERMS:
            s = ts[f"epsum_{k}"] + r[k]
            ts[f"epsum_{k}"] = s
            info[f"rew_{k}"] = jnp.where(
                done.any(), (s * done).sum() / n_done / self.max_episode_length_s, 0.0
            )
        info["terrain_level"] = ts["terrain_levels"].astype(jnp.float32).mean()
        state = state.replace(ts=ts)
        return state, total, done, {"episode": info}
