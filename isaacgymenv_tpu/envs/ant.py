"""Ant — MJCF quadruped run-toward-target locomotion.

Behavioral spec from the reference (ref: tasks/ant.py, cfg/task/Ant.yaml):
- obs (N, 60): [torso_z, vel_loc(3), angvel_loc(3), yaw, roll,
  angle_to_target, up_proj, heading_proj, dof_pos unscaled to [-1,1] (8),
  dof_vel*0.2 (8), foot force sensors (4*6)*0.1, actions (8)]
  (ant.py:352-407 compute_ant_observations)
- act (N, 8): torque = action * motor_gear(15) * powerScale (ant.py:281-285)
- reward: potential progress + alive 0.5 + up(>0.93)+0.1 +
  heading(>0.8? w : w*proj/0.8) - 0.005*actions^2 - 0.05*electricity -
  0.1*dofs_at_limit; death_cost -2 below z 0.31 (ant.py:305-350)
- reset: torso z < 0.31 or timeout 1000 steps
- reset state: dof_pos = clamp(init + U(-0.2,0.2), limits), dof_vel U(-0.1,.1),
  root = start (z=0.44); init_dof_pos = limit-clamped zeros (ant.py:97-100,252)
- potentials: -|to_target|/dt, target (1000,0,0) (ant.py:111-118)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.mjcf import load_mjcf
from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    dof_pos,
    dof_vel,
    root_state,
    set_dof_state,
    set_root_state,
)
from isaacgymenv_tpu.utils.config import asset_root


@register("Ant")
class Ant(TaskEnv):
    num_obs = 60
    num_actions = 8

    foot_fragment = "foot"
    asset_default = "mjcf/nv_ant.xml"
    start_z = 0.44  # ref: ant.py get_axis_params(0.44, up_axis)
    up_proj_thresh = 0.93

    def __init__(self, cfg):
        cfg["env"]["maxEpisodeLength"] = int(cfg["env"]["episodeLength"])
        super().__init__(cfg)
        e = cfg["env"]
        self.power_scale = float(e["powerScale"])
        self.heading_weight = float(e["headingWeight"])
        self.up_weight = float(e["upWeight"])
        self.actions_cost_scale = float(e["actionsCost"])
        self.energy_cost_scale = float(e["energyCost"])
        self.joints_at_limit_cost_scale = float(e["jointsAtLimitCost"])
        self.death_cost = float(e["deathCost"])
        self.termination_height = float(e["terminationHeight"])
        self.dof_vel_scale = float(e["dofVelocityScale"])
        self.contact_force_scale = float(e["contactForceScale"])

        self._build_model(cfg)
        m = self.model
        # initial dof pos: 0 clamped into limits (ant.py:97-100)
        zero = jnp.zeros(m.nd)
        self.initial_dof_pos = jnp.where(
            m.dof_lower > 0, m.dof_lower, jnp.where(m.dof_upper < 0, m.dof_upper, zero)
        )
        self.feet_indices = [
            i for i, n in enumerate(m.body_names)
            if self.foot_fragment in n and "__ph" not in n
        ]
        # true 6D force sensors on the feet (ref: ant.py:174-178
        # create_asset_force_sensor) — joint reaction wrenches, not the
        # contact-only approximation
        if not self.model.sensor_body:
            self.model = self.model.replace(sensor_body=tuple(self.feet_indices))
        self.targets = jnp.array([1000.0, 0.0, 0.0])
        self.start_rotation = jnp.array([0.0, 0.0, 0.0, 1.0])

    def _build_model(self, cfg):
        path = os.path.join(
            asset_root(), cfg["env"].get("asset", {}).get("assetFileName", self.asset_default)
        )
        friction = float(cfg["env"]["plane"]["staticFriction"])
        mb, info = load_mjcf(path)
        for gi in range(len(mb.geom_friction)):
            mb.geom_friction[gi] = friction  # plane friction dominates pairing
        for b in mb.bodies:
            b.drive_mode = DRIVE_EFFORT
            b.stiffness = 0.0
            # MJCF joint damping acts as passive drive damping in EFFORT mode;
            # keep it in dof_damping? engine only applies damping in POS/VEL —
            # fold into friction-style passive handled below via dof_damping=0
            b.effort = 1e9
        contact = cfg.get("sim", {}).get("contact", {})
        mb.contact_stiffness = float(contact.get("stiffness", 1000.0))
        mb.contact_damping = float(contact.get("damping", 30000.0))
        mb.tangential_stiffness = float(contact.get("tangential_stiffness", 1.0e6))
        mb.gravity = np.array(self.gravity)
        self.model = mb.finalize()
        from isaacgymenv_tpu.physics.meff import attach_effective_masses

        self.model = attach_effective_masses(self.model)
        self.terrain = None
        # map actuator order -> dof indices; gear vector in dof order
        gears_by_dof = np.zeros(self.model.nd)
        for jname, gear in zip(info["actuator_joints"], info["gears"]):
            gears_by_dof[self.model.dof_index(jname)] = gear
        self.joint_gears = jnp.array(gears_by_dof, jnp.float32)

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "actions": jnp.zeros((n, self.num_actions)),
            "potentials": jnp.full((n,), -1000.0 / self.dt),
            "prev_potentials": jnp.full((n,), -1000.0 / self.dt),
        }

    def _reset_envs(self, state, mask, key):
        n = mask.shape[0]
        k1, k2 = jax.random.split(key)
        m = self.model
        new_pos = jnp.clip(
            self.initial_dof_pos + jax.random.uniform(k1, (n, m.nd), minval=-0.2, maxval=0.2),
            m.dof_lower,
            m.dof_upper,
        )
        new_vel = jax.random.uniform(k2, (n, m.nd), minval=-0.1, maxval=0.1)
        mm = mask[:, None]
        sim = set_dof_state(
            m,
            state.sim,
            jnp.where(mm, new_pos, dof_pos(m, state.sim)),
            jnp.where(mm, new_vel, dof_vel(m, state.sim)),
        )
        init_root = jnp.zeros(13).at[2].set(self.start_z).at[6].set(1.0)
        cur_root = root_state(m, sim)[:, 0]
        sim = set_root_state(m, sim, jnp.where(mm, init_root, cur_root))

        to_target = self.targets - init_root[0:3]
        pot0 = -jnp.linalg.norm(to_target.at[2].set(0.0)) / self.dt
        ts = dict(state.ts)
        ts["potentials"] = jnp.where(mask, pot0, ts["potentials"])
        ts["prev_potentials"] = jnp.where(mask, pot0, ts["prev_potentials"])
        ts["actions"] = jnp.where(mm, 0.0, ts["actions"])
        return state.replace(sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts)

    def _make_control(self, state, actions):
        n = actions.shape[0]
        ctrl = engine.Control.zero(self.model, n)
        return ctrl.replace(effort=actions * self.joint_gears * self.power_scale)

    def _post_physics(self, state, actions):
        ts = dict(state.ts)
        ts["actions"] = actions
        # potentials update (ant.py:379-382, inside compute_observations)
        rs = root_state(self.model, state.sim)[:, 0]
        to_target = (self.targets - rs[:, 0:3]).at[:, 2].set(0.0)
        ts["prev_potentials"] = ts["potentials"]
        ts["potentials"] = -jnp.linalg.norm(to_target, axis=-1) / self.dt
        return state.replace(ts=ts)

    # ------------------------------------------------------------------
    def _sensor_forces(self, state):
        """(N, n_feet*6) foot force-torque sensor readings, foot-local frame
        (joint reaction wrenches — the acquire_force_sensor_tensor
        equivalent; falls back to the contact-wrench approximation for
        states predating the sensor plumbing)."""
        if state.sim.joint_wrench is not None:
            n = state.sim.joint_wrench.shape[0]
            return state.sim.joint_wrench.reshape(n, -1)
        out = []
        for b in self.feet_indices:
            q = state.sim.body_quat[:, b]
            f = maths.quat_rotate_inverse(q, state.sim.contact_force[:, b])
            t = maths.quat_rotate_inverse(q, state.sim.contact_torque[:, b])
            out.append(jnp.concatenate([f, t], axis=-1))
        return jnp.concatenate(out, axis=-1)

    def _observations(self, state, actions):
        m = self.model
        rs = root_state(m, state.sim)[:, 0]
        torso_pos, torso_rot = rs[:, 0:3], rs[:, 3:7]
        velocity, ang_velocity = rs[:, 7:10], rs[:, 10:13]
        to_target = (self.targets - torso_pos).at[:, 2].set(0.0)

        torso_quat, up_proj, heading_proj, _, _ = maths.compute_heading_and_up(
            torso_rot, jnp.broadcast_to(maths.quat_conjugate(self.start_rotation), torso_rot.shape),
            to_target,
            jnp.broadcast_to(jnp.array([1.0, 0, 0]), torso_pos.shape),
            jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), torso_pos.shape),
            2,
        )
        vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target = maths.compute_rot(
            torso_quat, velocity, ang_velocity,
            jnp.broadcast_to(self.targets, torso_pos.shape), torso_pos,
        )
        dp_scaled = maths.unscale(dof_pos(m, state.sim), m.dof_lower, m.dof_upper)
        dv = dof_vel(m, state.sim) * self.dof_vel_scale
        sensors = self._sensor_forces(state) * self.contact_force_scale
        return jnp.concatenate(
            [
                torso_pos[:, 2:3],
                vel_loc,
                angvel_loc,
                yaw[:, None],
                roll[:, None],
                angle_to_target[:, None],
                up_proj[:, None],
                heading_proj[:, None],
                dp_scaled,
                dv,
                sensors,
                state.ts["actions"],
            ],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        nd = self.model.nd
        heading_proj = obs[:, 11]
        up_proj = obs[:, 10]
        heading_reward = jnp.where(
            heading_proj > 0.8, self.heading_weight, self.heading_weight * heading_proj / 0.8
        )
        up_reward = jnp.where(up_proj > self.up_proj_thresh, self.up_weight, 0.0)

        actions_cost = jnp.sum(actions**2, axis=-1)
        electricity_cost = jnp.sum(
            jnp.abs(actions * obs[:, 12 + nd : 12 + 2 * nd]), axis=-1
        )
        dof_at_limit_cost = jnp.sum(obs[:, 12 : 12 + nd] > 0.99, axis=-1).astype(jnp.float32)

        alive_reward = 0.5
        progress_reward = state.ts["potentials"] - state.ts["prev_potentials"]

        total = (
            progress_reward
            + alive_reward
            + up_reward
            + heading_reward
            - self.actions_cost_scale * actions_cost
            - self.energy_cost_scale * electricity_cost
            - self.joints_at_limit_cost_scale * dof_at_limit_cost
        )
        fallen = obs[:, 0] < self.termination_height
        total = jnp.where(fallen, self.death_cost, total)
        done = fallen | (state.progress >= self.max_episode_length - 1)
        # true_objective for PBT ranking (ant.py:245-250)
        rs = root_state(self.model, state.sim)[:, 0]
        return state, total, done, {"true_objective": rs[:, 7]}
