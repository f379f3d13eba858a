"""Humanoid — 21-DoF MJCF biped, same family as Ant.

Behavioral spec (ref: tasks/humanoid.py, cfg/task/Humanoid.yaml):
- obs (N, 108): [z, vel_loc(3), angvel_loc*0.25(3), yaw, roll,
  angle_to_target (all normalize_angle'd), up_proj, heading_proj,
  dof_pos_scaled(21), dof_vel*0.1(21), dof_force*0.01(21),
  foot sensors 2x6 *0.01, actions(21)] (humanoid.py:379-417)
- reward like Ant but: alive 2.0, costs weighted by motor_effort_ratio,
  graded at-limit cost above |q|>0.98, death below z=0.8 (humanoid.py:324-377)
- act: torque = action * gear * powerScale; start z 1.34
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.ant import Ant
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics.types import dof_pos, dof_vel, root_state


@register("Humanoid")
class Humanoid(Ant):
    num_obs = 108
    num_actions = 21

    asset_default = "mjcf/nv_humanoid.xml"
    start_z = 1.34  # ref: humanoid.py get_axis_params(1.34, up_axis)

    def __init__(self, cfg):
        self.angular_velocity_scale = float(cfg["env"].get("angularVelocityScale", 0.1))
        super().__init__(cfg)
        # exclude phantom intermediate bodies from foot sensor matching
        self.feet_indices = [
            i
            for i, n in enumerate(self.model.body_names)
            if self.foot_fragment in n and "__ph" not in n
        ]
        self.motor_effort_ratio = self.joint_gears / jnp.max(self.joint_gears)

    def _observations(self, state, actions):
        m = self.model
        rs = root_state(m, state.sim)[:, 0]
        torso_pos, torso_rot = rs[:, 0:3], rs[:, 3:7]
        velocity, ang_velocity = rs[:, 7:10], rs[:, 10:13]
        to_target = (self.targets - torso_pos).at[:, 2].set(0.0)

        torso_quat, up_proj, heading_proj, _, _ = maths.compute_heading_and_up(
            torso_rot,
            jnp.broadcast_to(maths.quat_conjugate(self.start_rotation), torso_rot.shape),
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
                angvel_loc * self.angular_velocity_scale,
                maths.normalize_angle(yaw)[:, None],
                maths.normalize_angle(roll)[:, None],
                maths.normalize_angle(angle_to_target)[:, None],
                up_proj[:, None],
                heading_proj[:, None],
                dp_scaled,
                dv,
                state.sim.dof_force * self.contact_force_scale,
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
        up_reward = jnp.where(up_proj > 0.93, self.up_weight, 0.0)

        actions_cost = jnp.sum(actions**2, axis=-1)
        mer = self.motor_effort_ratio
        dof_pos_obs = obs[:, 12 : 12 + nd]
        dof_vel_obs = obs[:, 12 + nd : 12 + 2 * nd]
        scaled_cost = self.joints_at_limit_cost_scale * (jnp.abs(dof_pos_obs) - 0.98) / 0.02
        dof_at_limit_cost = jnp.sum(
            (jnp.abs(dof_pos_obs) > 0.98) * scaled_cost * mer, axis=-1
        )
        electricity_cost = jnp.sum(jnp.abs(actions * dof_vel_obs) * mer, axis=-1)

        alive_reward = 2.0
        progress_reward = state.ts["potentials"] - state.ts["prev_potentials"]
        total = (
            progress_reward
            + alive_reward
            + up_reward
            + heading_reward
            - self.actions_cost_scale * actions_cost
            - self.energy_cost_scale * electricity_cost
            - dof_at_limit_cost
        )
        fallen = obs[:, 0] < self.termination_height
        total = jnp.where(fallen, self.death_cost, total)
        done = fallen | (state.progress >= self.max_episode_length - 1)
        rs = root_state(self.model, state.sim)[:, 0]
        return state, total, done, {"true_objective": rs[:, 7]}
