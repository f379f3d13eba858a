"""Anymal — flat-terrain quadruped velocity-command locomotion.

Behavioral spec from the reference (ref: tasks/anymal.py, cfg/task/Anymal.yaml):
- obs (N, 48): [base_lin_vel*2.0 (body frame), base_ang_vel*0.25 (body frame),
  projected_gravity, commands*(2,2,.25), (dof_pos-default)*1.0, dof_vel*0.05,
  prev_actions]  (anymal.py:355-386)
  NOTE the reference computes projected_gravity with quat_rotate (NOT
  inverse) — replicated exactly (anymal.py:376).
- act (N, 12): PD position targets = 0.5*action + default_dof_pos, Kp 85 /
  Kd 2 PhysX drives (anymal.py:199-203, 226-229)
- reward (clipped >= 0): exp(-err/0.25) xy lin-vel + yaw ang-vel tracking +
  torque penalty; scales * dt (anymal.py:312-351)
- reset: |contact force| > 1 N on base or knees (THIGH bodies), or timeout
  at 50 s (anymal.py:331-337)
- reset state: root = baseInitState, dof_pos = default * U(0.5, 1.5),
  dof_vel ~ U(-0.1, 0.1), commands resampled per env (anymal.py:278-305)
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
from isaacgymenv_tpu.physics.types import (
    DRIVE_POS,
    dof_pos,
    dof_vel,
    root_state,
    set_dof_state,
    set_root_state,
)
from isaacgymenv_tpu.physics.urdf import AssetOptions, load_urdf
from isaacgymenv_tpu.utils.config import asset_root


@register("Anymal")
class Anymal(TaskEnv):
    num_obs = 48
    num_actions = 12

    # body-name fragments for contact termination (ref: anymal.py:192-195)
    knee_fragment = "THIGH"
    base_name = "base"
    asset_key = "urdfAsset"

    def __init__(self, cfg):
        # episode length from seconds (ref: anymal.py:84-86)
        dt = float(cfg.get("sim", {}).get("dt", 0.02))
        ep_s = float(cfg["env"]["learn"]["episodeLength_s"])
        cfg["env"]["maxEpisodeLength"] = int(ep_s / dt + 0.5)
        super().__init__(cfg)

        learn = cfg["env"]["learn"]
        self.lin_vel_scale = float(learn["linearVelocityScale"])
        self.ang_vel_scale = float(learn["angularVelocityScale"])
        self.dof_pos_scale = float(learn["dofPositionScale"])
        self.dof_vel_scale = float(learn["dofVelocityScale"])
        self.action_scale = float(cfg["env"]["control"]["actionScale"])
        self.Kp = float(cfg["env"]["control"]["stiffness"])
        self.Kd = float(cfg["env"]["control"]["damping"])
        # reward scales are multiplied by dt (ref: anymal.py:90-91)
        self.rew_scales = {
            "lin_vel_xy": float(learn["linearVelocityXYRewardScale"]) * dt,
            "ang_vel_z": float(learn["angularVelocityZRewardScale"]) * dt,
            "torque": float(learn["torqueRewardScale"]) * dt,
        }
        self.command_ranges = cfg["env"]["randomCommandVelocityRanges"]
        self.base_init_state = jnp.array(
            list(cfg["env"]["baseInitState"]["pos"])
            + list(cfg["env"]["baseInitState"]["rot"])
            + list(cfg["env"]["baseInitState"]["vLinear"])
            + list(cfg["env"]["baseInitState"]["vAngular"]),
            jnp.float32,
        )

        self._build_model(cfg)

        # default joint angles by dof name (ref: anymal.py:134-137)
        named = cfg["env"]["defaultJointAngles"]
        self.default_dof_pos = jnp.array(
            [float(named[n]) for n in self.model.dof_names], jnp.float32
        )

        names = self.model.body_names
        self.base_index = names.index(self.base_name)
        self.knee_indices = [i for i, n in enumerate(names) if self.knee_fragment in n]
        self.feet_indices = [i for i, n in enumerate(names) if "SHANK" in n]

    # ------------------------------------------------------------------
    def _build_model(self, cfg):
        asset_cfg = cfg["env"][self.asset_key]
        path = os.path.join(
            asset_root(), asset_cfg.get("file", "urdf/anymal_c/urdf/anymal.urdf")
        )
        friction = float(cfg["env"]["plane"]["staticFriction"])
        mb, info = load_urdf(
            path,
            AssetOptions(
                fix_base_link=bool(asset_cfg.get("fixBaseLink", False)),
                collapse_fixed_joints=bool(asset_cfg.get("collapseFixedJoints", True)),
                density=0.001,  # ref: anymal.py:179 asset_options.density
            ),
            friction=friction,
        )
        for b in mb.bodies:
            b.drive_mode = DRIVE_POS
            b.stiffness = self.Kp
            b.damping = self.Kd
        contact = cfg.get("sim", {}).get("contact", {})
        mb.contact_stiffness = float(contact.get("stiffness", 30000.0))
        mb.contact_damping = float(contact.get("damping", 300.0))
        mb.tangential_stiffness = float(contact.get("tangential_stiffness", 1.0e6))
        mb.gravity = np.array(self.gravity)
        self.model = mb.finalize()
        from isaacgymenv_tpu.physics.meff import attach_effective_masses

        self.model = attach_effective_masses(self.model)
        self.terrain = None
        self._info = info

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "commands": jnp.zeros((n, 3)),
            "actions": jnp.zeros((n, self.num_actions)),
        }

    def _resample_commands(self, key, n):
        kx, ky, kw = jax.random.split(key, 3)
        r = self.command_ranges
        cx = jax.random.uniform(kx, (n,), minval=r["linear_x"][0], maxval=r["linear_x"][1])
        cy = jax.random.uniform(ky, (n,), minval=r["linear_y"][0], maxval=r["linear_y"][1])
        cw = jax.random.uniform(kw, (n,), minval=r["yaw"][0], maxval=r["yaw"][1])
        return jnp.stack([cx, cy, cw], axis=-1)

    def _reset_envs(self, state, mask, key):
        n = mask.shape[0]
        k_pos, k_vel, k_cmd = jax.random.split(key, 3)
        nd = self.model.nd
        pos_offset = jax.random.uniform(k_pos, (n, nd), minval=0.5, maxval=1.5)
        new_pos = self.default_dof_pos * pos_offset
        new_vel = jax.random.uniform(k_vel, (n, nd), minval=-0.1, maxval=0.1)

        cur_pos = dof_pos(self.model, state.sim)
        cur_vel = dof_vel(self.model, state.sim)
        m = mask[:, None]
        sim = set_dof_state(
            self.model,
            state.sim,
            jnp.where(m, new_pos, cur_pos),
            jnp.where(m, new_vel, cur_vel),
        )
        cur_root = root_state(self.model, sim)[:, 0]
        new_root = jnp.where(m, self.base_init_state, cur_root)
        sim = set_root_state(self.model, sim, new_root)

        commands = jnp.where(m, self._resample_commands(k_cmd, n), state.ts["commands"])
        ts = dict(state.ts)
        ts["commands"] = commands
        ts["actions"] = jnp.where(m, 0.0, ts["actions"])
        return state.replace(
            sim=sim,
            progress=jnp.where(mask, 0, state.progress),
            ts=ts,
        )

    # ------------------------------------------------------------------
    def _make_control(self, state, actions):
        n = actions.shape[0]
        targets = self.action_scale * actions + self.default_dof_pos
        ctrl = engine.Control.zero(self.model, n)
        return ctrl.replace(pos_target=targets)

    def _post_physics(self, state, actions):
        ts = dict(state.ts)
        ts["actions"] = actions
        return state.replace(ts=ts)

    # ------------------------------------------------------------------
    def _base_vels(self, state):
        rs = root_state(self.model, state.sim)[:, 0]
        base_quat = rs[:, 3:7]
        lin = maths.quat_rotate_inverse(base_quat, rs[:, 7:10])
        ang = maths.quat_rotate_inverse(base_quat, rs[:, 10:13])
        return rs, base_quat, lin, ang

    def _observations(self, state, actions):
        rs, base_quat, base_lin_vel, base_ang_vel = self._base_vels(state)
        # QUIRK kept from reference: quat_rotate, not inverse (anymal.py:376)
        gravity_vec = jnp.array([0.0, 0.0, -1.0])
        projected_gravity = maths.quat_rotate(base_quat, jnp.broadcast_to(gravity_vec, base_quat.shape[:-1] + (3,)))
        dp = (dof_pos(self.model, state.sim) - self.default_dof_pos) * self.dof_pos_scale
        dv = dof_vel(self.model, state.sim) * self.dof_vel_scale
        cmd = state.ts["commands"] * jnp.array(
            [self.lin_vel_scale, self.lin_vel_scale, self.ang_vel_scale]
        )
        return jnp.concatenate(
            [
                base_lin_vel * self.lin_vel_scale,
                base_ang_vel * self.ang_vel_scale,
                projected_gravity,
                cmd,
                dp,
                dv,
                state.ts["actions"],
            ],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        rs, base_quat, base_lin_vel, base_ang_vel = self._base_vels(state)
        commands = state.ts["commands"]
        torques = state.sim.dof_force

        lin_vel_error = jnp.sum(jnp.square(commands[:, :2] - base_lin_vel[:, :2]), axis=1)
        ang_vel_error = jnp.square(commands[:, 2] - base_ang_vel[:, 2])
        rew_lin = jnp.exp(-lin_vel_error / 0.25) * self.rew_scales["lin_vel_xy"]
        rew_ang = jnp.exp(-ang_vel_error / 0.25) * self.rew_scales["ang_vel_z"]
        rew_torque = jnp.sum(jnp.square(torques), axis=1) * self.rew_scales["torque"]
        total = jnp.clip(rew_lin + rew_ang + rew_torque, 0.0, None)

        cf = state.sim.contact_force
        base_contact = jnp.linalg.norm(cf[:, self.base_index], axis=-1) > 1.0
        knee_contact = jnp.any(
            jnp.linalg.norm(cf[:, self.knee_indices], axis=-1) > 1.0, axis=-1
        )
        timeout = state.progress >= self.max_episode_length - 1
        done = base_contact | knee_contact | timeout
        return state, total, done, {}
