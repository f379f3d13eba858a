"""FrankaCubeStack — pick up cube A and stack it on cube B.

Behavioral spec (ref: tasks/franka_cube_stack.py:895-1574, the active class;
lines 1-894 are a commented-out older copy):
- franka_panda_gripper.urdf (7 arm dofs effort/OSC + 2 finger dofs POS
  Kp5000/Kd100, effort 200, gravity-compensated) fixed on a stand at
  (-0.45, 0, 1.125); table 1.2x1.2x0.05 at (0,0,1); cubes A (5 cm) and
  B (7 cm) sampled on the table (:1029-1054, :1088-1092).
- act (N, 7): OSC task-space delta (6) + gripper open/close (1, binary to
  finger limits) (:1459-1482); cmd_limit [0.1,0.1,0.1,0.5,0.5,0.5], OSC
  gains kp150/kd 2*sqrt, nullspace kp10 (:975-985, :1429-1457).
- obs (N, 19): cubeA_quat(4) cubeA_pos(3) cubeA_to_cubeB(3) eef_pos(3)
  eef_quat(4) q_gripper(2); eef = panda_grip_site (:1275-1283).
- reward (:1525-1574): reach (1-tanh(10*mean-finger-dist)) max'd with
  align term, lift bonus, and a terminal stack reward (aligned xy < 2 cm,
  correct height, gripper away) that also resets the env.
- reset (:1287-1343): cube B sampled freely, cube A resampled until
  collision-free (8 masked rounds here vs the reference's loop); franka
  dofs default + noise (fingers exact).
- QUIRK replicated: the reference uses cubeA's half-height for BOTH cubes'
  spawn z (:1371-1373), so cube B starts 1 cm sunk and pops out.
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
from isaacgymenv_tpu.physics import dynamics, engine, kinematics
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    DRIVE_POS,
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

FRANKA_DEFAULT = (0.0, 0.1963, 0.0, -2.6180, 0.0, 2.9416, 0.7854, 0.035, 0.035)
TABLE_POS = (0.0, 0.0, 1.0)
TABLE_THICK = 0.05
TABLE_HEIGHT = TABLE_POS[2] + TABLE_THICK / 2  # 1.025
CUBE_A, CUBE_B = 0.050, 0.070


def _add_box_actor(mb, name, half, pos, mass, fixed=False, friction=1.0):
    """Free/fixed box actor: SURF_BOX + 8 corner contact spheres."""
    b = mb.add_body(
        name, -1, JT_FIXED if fixed else JT_FREE,
        joint_pos=pos if fixed else (0, 0, 0),
        mass=mass, inertia=B.box_inertia(mass, 2 * half[0], 2 * half[1], 2 * half[2]),
    )
    mb.add_surface(b, B.ModelBuilder.SURF_BOX, (0, 0, 0), None, half, friction)
    if not fixed:
        r = max(min(half) / 2.0, 1e-3)
        for dx in (-1, 1):
            for dy in (-1, 1):
                for dz in (-1, 1):
                    mb.add_geom_sphere(
                        b,
                        (dx * (half[0] - r), dy * (half[1] - r), dz * (half[2] - r)),
                        r,
                        friction,
                    )
    return b


@register("FrankaCubeStack")
class FrankaCubeStack(TaskEnv):
    num_obs = 19
    num_actions = 7

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 300)))
        super().__init__(cfg)
        self.control_type = e.get("controlType", "osc")
        assert self.control_type in ("osc", "joint_tor")
        if self.control_type == "joint_tor":
            self.num_obs, self.num_actions = 26, 8
        self.action_scale = float(e.get("actionScale", 1.0))
        self.start_position_noise = float(e.get("startPositionNoise", 0.25))
        self.start_rotation_noise = float(e.get("startRotationNoise", 0.785))
        self.franka_dof_noise = float(e.get("frankaDofNoise", 0.25))
        self.r_dist = float(e.get("distRewardScale", 0.1))
        self.r_lift = float(e.get("liftRewardScale", 1.5))
        self.r_align = float(e.get("alignRewardScale", 2.0))
        self.r_stack = float(e.get("stackRewardScale", 16.0))
        self._build_model(cfg)
        self.kp, self.kd = 150.0, 2.0 * np.sqrt(150.0)
        self.kp_null, self.kd_null = 10.0, 2.0 * np.sqrt(10.0)
        self.cmd_limit = jnp.array([0.1, 0.1, 0.1, 0.5, 0.5, 0.5], jnp.float32)

    def _build_model(self, cfg):
        fb, finfo = load_urdf(
            os.path.join(
                asset_root(), "urdf/franka_description/robots/franka_panda_gripper.urdf"
            ),
            AssetOptions(fix_base_link=True, collapse_fixed_joints=False, density=1000.0),
            base_pos=(-0.45, 0.0, TABLE_POS[2] + TABLE_THICK / 2 + 0.1),
        )
        i = 0
        for b in fb.bodies:
            b.gravcomp = 1.0  # disable_gravity (ref :1019)
            if b.jtype in (1, 2):
                if i < 7:
                    b.drive_mode = DRIVE_EFFORT
                    b.stiffness = 0.0
                    b.damping = 0.0
                else:  # fingers (ref :1025-1026 Kp 5000 Kd 100, effort 200)
                    b.drive_mode = DRIVE_POS
                    b.stiffness = 5000.0
                    b.damping = 100.0
                    b.effort = 200.0
                i += 1
        _add_box_actor(fb, "table", (0.6, 0.6, TABLE_THICK / 2), TABLE_POS, 100.0, fixed=True)
        _add_box_actor(
            fb, "table_stand", (0.1, 0.1, 0.05),
            (-0.5, 0.0, TABLE_POS[2] + TABLE_THICK / 2 + 0.05), 20.0, fixed=True,
        )
        m_a = 1000.0 * CUBE_A**3
        m_b = 1000.0 * CUBE_B**3
        self.cubeA_body = _add_box_actor(fb, "cubeA", (CUBE_A / 2,) * 3, None, m_a)
        self.cubeB_body = _add_box_actor(fb, "cubeB", (CUBE_B / 2,) * 3, None, m_b)
        fb.gravity = np.array(self.gravity)
        self.model = attach_effective_masses(fb.finalize())
        self.eef_body = finfo["link_body"]["panda_grip_site"]
        self.lf_body = finfo["link_body"]["panda_leftfinger_tip"]
        self.rf_body = finfo["link_body"]["panda_rightfinger_tip"]
        self.cubeA_actor = 3  # franka, table, stand, cubeA, cubeB
        self.cubeB_actor = 4
        self.arm_dofs = np.arange(7)
        self.finger_dofs = np.arange(7, 9)
        self.arm_v_adr = np.array([self.model.dof_v_adr[d] for d in self.arm_dofs])
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)
        self.effort_limit = jnp.asarray(self.model.dof_effort)[:7]
        self.default_dof = jnp.array(FRANKA_DEFAULT, jnp.float32)

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "actions": jnp.zeros((n, self.num_actions)),
            "gripper_targets": jnp.full((n, 2), 0.035),
        }

    def _sample_cube_states(self, key, n):
        """Cube B free, cube A resampled away from B (ref :1345-1427)."""
        kb, ka, krots = jax.random.split(key, 3)
        noise = self.start_position_noise
        center = jnp.array(TABLE_POS[:2])
        # QUIRK replicated: both cubes spawn at table + cubeA/2 (ref :1371-1373)
        z = TABLE_HEIGHT + CUBE_A / 2
        b_xy = center + 2.0 * noise * (jax.random.uniform(kb, (n, 2)) - 0.5)
        min_dist = (CUBE_A + CUBE_B) * np.sqrt(2) / 2.0 * 2.0
        a_xy = center + 2.0 * noise * (jax.random.uniform(ka, (n, 2)) - 0.5)
        for i in range(8):  # masked resampling rounds
            bad = jnp.linalg.norm(a_xy - b_xy, axis=-1) < min_dist
            new_xy = center + 2.0 * noise * (
                jax.random.uniform(jax.random.fold_in(ka, i + 1), (n, 2)) - 0.5
            )
            a_xy = jnp.where(bad[:, None], new_xy, a_xy)
        k1, k2 = jax.random.split(krots)

        def yaw_quat(k):
            yaw = 2.0 * self.start_rotation_noise * (jax.random.uniform(k, (n,)) - 0.5)
            z_unit = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (n, 3))
            return maths.quat_from_angle_axis(yaw, z_unit)

        def mk(xy, rot):
            s = jnp.zeros((n, 13)).at[:, 0:2].set(xy).at[:, 2].set(z)
            return s.at[:, 3:7].set(rot)

        return mk(a_xy, yaw_quat(k1)), mk(b_xy, yaw_quat(k2))

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        k_cube, k_dof = jax.random.split(key)
        a_state, b_state = self._sample_cube_states(k_cube, n)
        rs = root_state(m, state.sim)
        mm3 = mask[:, None]
        rs = rs.at[:, self.cubeA_actor].set(
            jnp.where(mm3, a_state, rs[:, self.cubeA_actor])
        )
        rs = rs.at[:, self.cubeB_actor].set(
            jnp.where(mm3, b_state, rs[:, self.cubeB_actor])
        )
        sim = set_root_state(m, state.sim, rs)

        noise = jax.random.uniform(k_dof, (n, 9))
        pos = jnp.clip(
            self.default_dof + self.franka_dof_noise * 2.0 * (noise - 0.5),
            self.dof_lower, self.dof_upper,
        )
        pos = pos.at[:, 7:].set(jnp.array(FRANKA_DEFAULT[7:]))  # fingers exact
        sim = set_dof_state(
            m, sim,
            jnp.where(mm3, pos, dof_pos(m, sim)),
            jnp.where(mm3, 0.0, dof_vel(m, sim)),
        )
        ts = dict(state.ts)
        ts["gripper_targets"] = jnp.where(mm3, 0.035, ts["gripper_targets"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    # ------------------------------------------------------------------
    def _osc_torques(self, state, dpose):
        """ref: _compute_osc_torques (franka_cube_stack.py:1429-1457)."""
        m = self.model
        q = dof_pos(m, state.sim)[:, :7]
        qd = dof_vel(m, state.sim)[:, :7]
        kin = kinematics.fk(m, state.sim.q, state.sim.qd)
        inertias = dynamics.body_spatial_inertias(m, (q.shape[0],), q.dtype)
        av = self.arm_v_adr
        M = dynamics.crba(m, kin, inertias)[..., av, :][..., :, av]
        eef_pos = kin.p_w[self.eef_body]
        J = kinematics.body_jacobian(m, kin, self.eef_body, eef_pos)[..., :, av]
        ang, lin = kinematics.world_velocities(m, kin)
        eef_vel = jnp.concatenate([lin[self.eef_body], ang[self.eef_body]], -1)

        eye = jnp.eye(7, dtype=q.dtype)
        eye6 = jnp.eye(6, dtype=q.dtype)
        Minv = jnp.linalg.solve(M + 1e-9 * eye, jnp.broadcast_to(eye, M.shape))
        m_eef_inv = J @ Minv @ jnp.swapaxes(J, -1, -2)
        m_eef = jnp.linalg.solve(
            m_eef_inv + 1e-2 * eye6, jnp.broadcast_to(eye6, m_eef_inv.shape)
        )
        u = jnp.swapaxes(J, -1, -2) @ m_eef @ (
            self.kp * dpose - self.kd * eef_vel
        )[..., None]
        j_eef_inv = m_eef @ J @ Minv
        u_null = self.kd_null * -qd + self.kp_null * (
            jnp.mod(self.default_dof[:7] - q + jnp.pi, 2 * jnp.pi) - jnp.pi
        )
        u_null = M @ u_null[..., None]
        proj = jnp.broadcast_to(eye, M.shape) - jnp.swapaxes(J, -1, -2) @ j_eef_inv
        u = (u + proj @ u_null)[..., 0]
        return jnp.clip(u, -self.effort_limit, self.effort_limit)

    def _make_control(self, state, actions):
        m = self.model
        n = actions.shape[0]
        ts = dict(state.ts)
        u_arm, u_gripper = actions[:, :-1], actions[:, -1]
        if self.control_type == "osc":
            dpose = u_arm * self.cmd_limit / self.action_scale
            u = self._osc_torques(state, dpose)
        else:
            u = jnp.clip(
                u_arm * self.effort_limit / self.action_scale,
                -self.effort_limit, self.effort_limit,
            )
        # binary gripper: snap targets to limits (ref :1471-1478)
        f_lo = self.dof_lower[self.finger_dofs]
        f_hi = self.dof_upper[self.finger_dofs]
        fingers = jnp.where(u_gripper[:, None] >= 0.0, f_hi, f_lo)
        ts["gripper_targets"] = fingers
        ts["actions"] = actions
        effort = jnp.zeros((n, m.nd)).at[:, :7].set(u)
        targets = jnp.zeros((n, m.nd)).at[:, self.finger_dofs].set(fingers)
        return (
            engine.Control.zero(m, n).replace(effort=effort, pos_target=targets),
            state.replace(ts=ts),
        )

    # ------------------------------------------------------------------
    def _scene_state(self, state):
        sim = state.sim
        rs = root_state(self.model, sim)
        cubeA = rs[:, self.cubeA_actor]
        cubeB = rs[:, self.cubeB_actor]
        eef_pos = sim.body_pos[:, self.eef_body]
        eef_quat = sim.body_quat[:, self.eef_body]
        return cubeA, cubeB, eef_pos, eef_quat

    def _observations(self, state, actions):
        m = self.model
        cubeA, cubeB, eef_pos, eef_quat = self._scene_state(state)
        q = dof_pos(m, state.sim)
        tail = q[:, 7:9] if self.control_type == "osc" else q
        return jnp.concatenate(
            [
                cubeA[:, 3:7],
                cubeA[:, 0:3],
                cubeB[:, 0:3] - cubeA[:, 0:3],
                eef_pos,
                eef_quat,
                tail,
            ],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        """Port of the active compute_franka_reward (:1525-1574)."""
        sim = state.sim
        cubeA, cubeB, eef_pos, _ = self._scene_state(state)
        lf = sim.body_pos[:, self.lf_body]
        rf = sim.body_pos[:, self.rf_body]
        target_height = CUBE_B + CUBE_A / 2.0

        d = jnp.linalg.norm(cubeA[:, 0:3] - eef_pos, axis=-1)
        d_lf = jnp.linalg.norm(cubeA[:, 0:3] - lf, axis=-1)
        d_rf = jnp.linalg.norm(cubeA[:, 0:3] - rf, axis=-1)
        dist_reward = 1 - jnp.tanh(10.0 * (d + d_lf + d_rf) / 3)

        cubeA_height = cubeA[:, 2] - TABLE_HEIGHT
        cubeA_lifted = (cubeA_height - CUBE_A) > 0.04
        lift_reward = cubeA_lifted.astype(jnp.float32)

        to_b = cubeB[:, 0:3] - cubeA[:, 0:3]
        offset = jnp.zeros_like(to_b).at[:, 2].set((CUBE_A + CUBE_B) / 2)
        d_ab = jnp.linalg.norm(to_b + offset, axis=-1)
        align_reward = (1 - jnp.tanh(10.0 * d_ab)) * cubeA_lifted
        dist_reward = jnp.maximum(dist_reward, align_reward)

        aligned = jnp.linalg.norm(to_b[:, :2], axis=-1) < 0.02
        on_top = jnp.abs(cubeA_height - target_height) < 0.02
        gripper_away = d > 0.04
        stack_reward = aligned & on_top & gripper_away

        rewards = jnp.where(
            stack_reward,
            self.r_stack * stack_reward,
            self.r_dist * dist_reward
            + self.r_lift * lift_reward
            + self.r_align * align_reward,
        )
        done = stack_reward | (state.progress >= self.max_episode_length - 1)
        info = {"episode": {"lift": lift_reward.mean(), "stack": stack_reward.mean()}}
        return state, rewards, done, info
