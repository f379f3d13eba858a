"""Quadcopter — tilt-rotor hover-to-target with direct thrust forces.

Behavioral spec (ref: tasks/quadcopter.py):
- procedural model (:121-203): free chassis (cylinder r=.1 t=.03 rho=50) +
  4 rotor arms (sphere r=.01 rho=200, pitch hinge +-30deg) each carrying a
  rotor (cylinder r=.04 t=.01 rho=1000, roll hinge +-30deg); 8 dofs,
  9 bodies; PD position drive Kp=1000 Kd=0 (:246-249).
- act (N, 12): 0:8 dof target *velocities* (integrated: target += dt*8pi*a,
  clamped to limits, :310-312) + 8:12 thrust *velocities*
  (thrust += dt*200*a, clamped [0, 2] N, :314-316).
- thrust force along each rotor's local +z (LOCAL_SPACE force at rotor
  bodies 2/4/6/8, :318-333).
- obs (N, 21): (target - pos)/3, quat, linvel/2, angvel/pi, dof_pos
  (:359-368); fixed target (0, 0, 1).
- reward (:385-417): pos 1/(1+d^2) * (1 + up + spinnage terms); die on
  d > 3 or z < 0.3; timeout at maxEpisodeLength.
- reset (:280-298): root z=1 with xyz noise, dof pos U(-.2,.2), zero vel,
  thrusts/targets cleared.

TPU note: thrust is a Control.body_wrench; the local->world force rotation
uses the rotor quaternions from the state caches, computed once per control
step (the reference applies LOCAL_SPACE forces once per step too).
No contact spheres: the env terminates at z < 0.3 before ground contact.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import builder as B
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.types import (
    DRIVE_POS,
    JT_FREE,
    JT_REVOLUTE,
    dof_pos,
    dof_vel,
    root_state,
    set_dof_state,
    set_root_state,
)


def _build_quadcopter():
    """Procedural model mirroring _create_quadcopter_asset (quadcopter.py:121)."""
    mb = B.ModelBuilder()
    chassis_radius, chassis_t = 0.1, 0.03
    rotor_radius, rotor_t = 0.04, 0.01
    arm_radius = 0.01

    m_ch = 50.0 * math.pi * chassis_radius**2 * chassis_t
    chassis = mb.add_body(
        "chassis", -1, JT_FREE,
        mass=m_ch, inertia=B.cylinder_inertia(m_ch, chassis_radius, chassis_t),
    )
    rotor_bodies = []
    for i, ang in enumerate([0.25 * math.pi, 0.75 * math.pi, 1.25 * math.pi, 1.75 * math.pi]):
        qa = np.array([0.0, 0.0, math.sin(ang / 2), math.cos(ang / 2)])  # yaw quat
        arm_off_local = np.array([chassis_radius + 0.25 * arm_radius, 0, 0])
        Rz = np.array(
            [[math.cos(ang), -math.sin(ang), 0], [math.sin(ang), math.cos(ang), 0], [0, 0, 1]]
        )
        m_arm = 200.0 * 4.0 / 3.0 * math.pi * arm_radius**3
        arm = mb.add_body(
            f"rotor_arm{i}", chassis, JT_REVOLUTE,
            joint_pos=Rz @ arm_off_local,
            joint_quat=qa,
            joint_axis=(0, 1, 0),  # pitch
            joint_name=f"rotor_pitch{i}",
            mass=m_arm, inertia=B.sphere_inertia(m_arm, arm_radius),
            lower=-math.pi / 6, upper=math.pi / 6, has_limit=True,
            drive_mode=DRIVE_POS, stiffness=1000.0, damping=0.0, effort=1e6,
        )
        m_rot = 1000.0 * math.pi * rotor_radius**2 * rotor_t
        rotor = mb.add_body(
            f"rotor{i}", arm, JT_REVOLUTE,
            joint_pos=(rotor_radius + 0.25 * arm_radius, 0, 0),
            joint_axis=(1, 0, 0),  # roll
            joint_name=f"rotor_roll{i}",
            mass=m_rot, inertia=B.cylinder_inertia(m_rot, rotor_radius, rotor_t),
            lower=-math.pi / 6, upper=math.pi / 6, has_limit=True,
            drive_mode=DRIVE_POS, stiffness=1000.0, damping=0.0, effort=1e6,
        )
        rotor_bodies.append(rotor)
    return mb, rotor_bodies


@register("Quadcopter")
class Quadcopter(TaskEnv):
    num_obs = 21
    num_actions = 12

    def __init__(self, cfg):
        super().__init__(cfg)
        mb, self.rotor_bodies = _build_quadcopter()
        mb.gravity = np.array(self.gravity)
        self.model = mb.finalize()
        self.thrust_max = 2.0
        self.target = jnp.array([0.0, 0.0, 1.0])

    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "dof_targets": jnp.zeros((n, 8)),
            "thrusts": jnp.zeros((n, 4)),
        }

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        k_xyz, k_dof = jax.random.split(key)
        rs = root_state(m, state.sim)[:, 0]
        init = jnp.zeros((n, 13)).at[:, 6].set(1.0).at[:, 2].set(1.0)
        noise = jax.random.uniform(
            k_xyz, (n, 3),
            minval=jnp.array([-1.5, -1.5, -0.2]), maxval=jnp.array([1.5, 1.5, 1.5]),
        )
        init = init.at[:, 0:3].add(noise)
        mm = mask[:, None]
        sim = set_root_state(m, state.sim, jnp.where(mm, init, rs))
        new_dp = jax.random.uniform(k_dof, (n, 8), minval=-0.2, maxval=0.2)
        sim = set_dof_state(
            m, sim,
            jnp.where(mm, new_dp, dof_pos(m, sim)),
            jnp.where(mm, 0.0, dof_vel(m, sim)),
        )
        ts = dict(state.ts)
        ts["dof_targets"] = jnp.where(mm, new_dp, ts["dof_targets"])
        ts["thrusts"] = jnp.where(mm, 0.0, ts["thrusts"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    def _make_control(self, state, actions):
        m = self.model
        n = actions.shape[0]
        ts = dict(state.ts)
        targets = jnp.clip(
            ts["dof_targets"] + self.dt * 8.0 * math.pi * actions[:, 0:8],
            jnp.asarray(m.dof_lower), jnp.asarray(m.dof_upper),
        )
        thrusts = jnp.clip(
            ts["thrusts"] + self.dt * 200.0 * actions[:, 8:12], 0.0, self.thrust_max
        )
        ts["dof_targets"], ts["thrusts"] = targets, thrusts
        # local +z thrust at each rotor -> world wrench at the rotor body
        wrench = jnp.zeros((n, m.nb, 6))
        for k, b in enumerate(self.rotor_bodies):
            f_w = maths.quat_rotate(
                state.sim.body_quat[:, b],
                jnp.concatenate(
                    [jnp.zeros((n, 2)), thrusts[:, k : k + 1]], axis=-1
                ),
            )
            wrench = wrench.at[:, b, 3:6].set(f_w)
        ctrl = engine.Control.zero(m, n).replace(
            pos_target=targets, body_wrench=wrench
        )
        return ctrl, state.replace(ts=ts)

    def _observations(self, state, actions):
        m = self.model
        rs = root_state(m, state.sim)[:, 0]
        return jnp.concatenate(
            [
                (self.target - rs[:, 0:3]) / 3.0,
                rs[:, 3:7],
                rs[:, 7:10] / 2.0,
                rs[:, 10:13] / math.pi,
                dof_pos(m, state.sim),
            ],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        m = self.model
        rs = root_state(m, state.sim)[:, 0]
        pos, quat = rs[:, 0:3], rs[:, 3:7]
        target_dist = jnp.linalg.norm(self.target - pos, axis=-1)
        pos_reward = 1.0 / (1.0 + target_dist * target_dist)
        ups = maths.quat_axis(quat, 2)
        tiltage = jnp.abs(1.0 - ups[..., 2])
        up_reward = 1.0 / (1.0 + tiltage * tiltage)
        spinnage = jnp.abs(rs[:, 12])
        spin_reward = 1.0 / (1.0 + spinnage * spinnage)
        reward = pos_reward + pos_reward * (up_reward + spin_reward)

        die = (target_dist > 3.0) | (pos[:, 2] < 0.3)
        timeout = state.progress >= self.max_episode_length - 1
        done = die | timeout
        return state, reward, done, {}
