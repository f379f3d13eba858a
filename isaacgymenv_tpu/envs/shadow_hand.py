"""ShadowHand — canonical in-hand cube reorientation.

Behavioral spec (ref: tasks/shadow_hand.py):
- OpenAI shadow hand MJCF (24 dofs, 20 position actuators, 4 coupled distal
  joints via fixed tendons) fixed at (0,0,0.5), palm up; free cube object
  (5 cm, 71 g) dropped onto the palm; goal = random target orientation
  (:586-600 reset_target_pose; the displaced goal actor is visual-only and
  not simulated here).
- act (N, 20): absolute position targets scaled to actuated dof limits with
  moving average, or relative targets (dofSpeedScale) (:684-698).
- obs types (:102-133): openai 42 / full_no_vel 77 / full 157 / full_state
  211 (+ asymmetric states 211); fingertip force-torque sensors are
  approximated by the fingertip bodies' net contact wrenches.
- reward (:747-800): dist*scale + 1/(|rot_dist|+eps)*rot_scale + action
  penalty; +reach_goal_bonus when rot_dist < tolerance (goal then resets
  WITHOUT env reset); fall penalty/reset when cube drifts > fall_dist;
  consecutive-success EMA logged (:416-424).
- reset (:602-667): object pose noise + random rotation, hand dofs
  default + noise * interval, targets snapped to reset pose.
- optional random object forces (forceScale > 0, :700-709) with per-env
  log-uniform probability, decaying.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.mjcf import MJCFOptions, load_mjcf
from isaacgymenv_tpu.physics.types import (
    dof_pos,
    dof_vel,
    root_state,
    set_dof_state,
    set_root_state,
)
from isaacgymenv_tpu.physics.urdf import AssetOptions, load_urdf
from isaacgymenv_tpu.utils.config import asset_root


@register("ShadowHand")
class ShadowHand(TaskEnv):
    num_actions = 20

    hand_asset = "mjcf/open_ai_assets/hand/shadow_hand.xml"
    fingertips = (
        "robot0:ffdistal", "robot0:mfdistal", "robot0:rfdistal",
        "robot0:lfdistal", "robot0:thdistal",
    )
    hand_start = (0.0, 0.0, 0.5)
    object_offset = (0.0, -0.39, 0.10)  # rel. hand (ref: pose_dy, pose_dz :310-316)

    NUM_OBS = {"openai": 42, "full_no_vel": 77, "full": 157, "full_state": 211}

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 600)))
        super().__init__(cfg)
        self.obs_type = e.get("observationType", "full_state")
        self.num_obs = self.NUM_OBS[self.obs_type]
        self.asymmetric_obs = bool(e.get("asymmetric_observations", False))
        self.num_states = 211 if self.asymmetric_obs else 0

        self.dist_reward_scale = float(e.get("distRewardScale", -10.0))
        self.rot_reward_scale = float(e.get("rotRewardScale", 1.0))
        self.action_penalty_scale = float(e.get("actionPenaltyScale", -0.0002))
        self.success_tolerance = float(e.get("successTolerance", 0.1))
        self.reach_goal_bonus = float(e.get("reachGoalBonus", 250.0))
        self.fall_dist = float(e.get("fallDistance", 0.24))
        self.fall_penalty = float(e.get("fallPenalty", 0.0))
        self.rot_eps = float(e.get("rotEps", 0.1))
        self.max_consecutive_successes = int(e.get("maxConsecutiveSuccesses", 0))
        self.av_factor = float(e.get("averFactor", 0.1))
        self.reset_position_noise = float(e.get("resetPositionNoise", 0.01))
        self.reset_dof_pos_noise = float(e.get("resetDofPosRandomInterval", 0.2))
        self.reset_dof_vel_noise = float(e.get("resetDofVelRandomInterval", 0.0))
        self.use_relative_control = bool(e.get("useRelativeControl", False))
        self.dof_speed_scale = float(e.get("dofSpeedScale", 20.0))
        self.act_moving_average = float(e.get("actionsMovingAverage", 1.0))
        self.force_scale = float(e.get("forceScale", 0.0))
        self.force_prob_range = tuple(e.get("forceProbRange", [0.001, 0.1]))
        self.force_decay = float(e.get("forceDecay", 0.99))
        self.force_decay_interval = float(e.get("forceDecayInterval", 0.08))
        self.vel_obs_scale = 0.2
        self.ft_obs_scale = 10.0

        self._build_model(cfg)

    # ------------------------------------------------------------------
    def _object_asset(self, cfg):
        obj = cfg["env"].get("objectType", "block")
        assert obj == "block", f"only block supported so far (got {obj})"
        path = os.path.join(asset_root(), "urdf/objects/cube_multicolor.urdf")
        return load_urdf(path, AssetOptions(density=567.0))

    def _build_model(self, cfg):
        mb, info = load_mjcf(
            os.path.join(asset_root(), self.hand_asset),
            MJCFOptions(fix_base_link=True, base_pos=self.hand_start),
        )
        ob, _ = self._object_asset(cfg)
        off = mb.merge(ob)
        mb.gravity = np.array(self.gravity)
        # the hand is mounted ~0.5 m up; the fall-distance reset (0.24 from
        # the goal, ref ShadowHand.yaml fallDistance) fires long before any
        # geom could reach the z=0 plane — skip the ground-contact pass
        # (SimModel.no_ground; identical dynamics, big VMEM/FLOP savings)
        mb.no_ground = True
        model = mb.finalize()
        self.model = attach_effective_masses(model)
        self._info = info
        names = self.model.body_names
        self.fingertip_bodies = np.array([names.index(f) for f in self.fingertips])
        self.object_actor = 1
        self.object_body = self.model.actor_root[1]
        # actuated dofs in actuator order (ref: actuated_dof_indices :276-277)
        dof_names = self.model.dof_names
        self.actuated = np.array(
            [dof_names.index(j) for j, _, _ in info["position_actuators"]]
        )
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)
        self.object_init = jnp.array(
            list(np.add(self.hand_start, self.object_offset)) + [0, 0, 0, 1] + [0.0] * 6,
            jnp.float32,
        )
        self.object_mass = float(self.model.body_mass[self.object_body])

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        k1, k2 = jax.random.split(key)
        return {
            "cur_targets": jnp.zeros((n, self.model.nd)),
            "goal_rot": jnp.zeros((n, 4)).at[:, 3].set(1.0),
            "actions": jnp.zeros((n, self.num_actions)),
            "successes": jnp.zeros(n),
            "consecutive_successes": jnp.zeros(()),
            "reset_goal": jnp.zeros(n, bool),
            "rb_force": jnp.zeros((n, 3)),
            "force_prob": jnp.full((n,), 0.01),
        }

    @property
    def goal_pos(self):
        # object init pos shifted down 0.04 (ref: goal_states :404-406)
        return self.object_init[0:3] - jnp.array([0.0, 0.0, 0.04])

    def _random_quat(self, key, n):
        """randomize_rotation (ref: shadow_hand.py:805-808)."""
        k0, k1 = jax.random.split(key)
        r0 = jax.random.uniform(k0, (n,), minval=-1.0, maxval=1.0)
        r1 = jax.random.uniform(k1, (n,), minval=-1.0, maxval=1.0)
        x_unit = jnp.broadcast_to(jnp.array([1.0, 0, 0]), (n, 3))
        y_unit = jnp.broadcast_to(jnp.array([0.0, 1.0, 0]), (n, 3))
        return maths.quat_mul(
            maths.quat_from_angle_axis(r0 * jnp.pi, x_unit),
            maths.quat_from_angle_axis(r1 * jnp.pi, y_unit),
        )

    def _sample_force_prob(self, key, n):
        lo, hi = self.force_prob_range
        u = jax.random.uniform(key, (n,))
        return jnp.exp((jnp.log(lo) - jnp.log(hi)) * u + jnp.log(hi))

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        k_obj_pos, k_obj_rot, k_goal, k_dof, k_dvel, k_fp = jax.random.split(key, 6)
        ts = dict(state.ts)

        # goal (also resampled alone on goal-only resets in _make_control)
        ts["goal_rot"] = jnp.where(
            mask[:, None], self._random_quat(k_goal, n), ts["goal_rot"]
        )
        ts["reset_goal"] = jnp.where(mask, False, ts["reset_goal"])

        # object root
        rs = root_state(m, state.sim)
        obj = jnp.broadcast_to(self.object_init, (n, 13))
        pos_noise = self.reset_position_noise * jax.random.uniform(
            k_obj_pos, (n, 3), minval=-1.0, maxval=1.0
        )
        obj = obj.at[:, 0:3].add(pos_noise)
        obj = obj.at[:, 3:7].set(self._random_quat(k_obj_rot, n))
        new_rs = rs.at[:, self.object_actor].set(
            jnp.where(mask[:, None], obj, rs[:, self.object_actor])
        )
        sim = set_root_state(m, state.sim, new_rs)

        # hand dofs: default(0) + noise * rand_delta (ref :644-652)
        rand = jax.random.uniform(k_dof, (n, m.nd), minval=-1.0, maxval=1.0)
        delta_max = self.dof_upper
        delta_min = self.dof_lower
        rand_delta = delta_min + (delta_max - delta_min) * 0.5 * (rand + 1.0)
        pos = self.reset_dof_pos_noise * rand_delta
        vel = self.reset_dof_vel_noise * jax.random.uniform(
            k_dvel, (n, m.nd), minval=-1.0, maxval=1.0
        )
        mm = mask[:, None]
        sim = set_dof_state(
            m, sim,
            jnp.where(mm, pos, dof_pos(m, sim)),
            jnp.where(mm, vel, dof_vel(m, sim)),
        )
        ts["cur_targets"] = jnp.where(mm, pos, ts["cur_targets"])
        ts["successes"] = jnp.where(mask, 0.0, ts["successes"])
        ts["rb_force"] = jnp.where(mm, 0.0, ts["rb_force"])
        ts["force_prob"] = jnp.where(
            mask, self._sample_force_prob(k_fp, n), ts["force_prob"]
        )
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    # ------------------------------------------------------------------
    def _make_control(self, state, actions):
        m = self.model
        n = actions.shape[0]
        ts = dict(state.ts)
        # goal-only resets (ref: pre_physics_step :671-679)
        k_goal = jax.random.fold_in(state.rng, 41)
        new_goal = self._random_quat(k_goal, n)
        ts["goal_rot"] = jnp.where(
            ts["reset_goal"][:, None], new_goal, ts["goal_rot"]
        )
        ts["reset_goal"] = jnp.zeros_like(ts["reset_goal"])

        lo = self.dof_lower[self.actuated]
        hi = self.dof_upper[self.actuated]
        prev = ts["cur_targets"][:, self.actuated]
        if self.use_relative_control:
            tgt = jnp.clip(prev + self.dof_speed_scale * self.dt * actions, lo, hi)
        else:
            tgt = maths.scale(actions, lo, hi)
            tgt = self.act_moving_average * tgt + (1.0 - self.act_moving_average) * prev
            tgt = jnp.clip(tgt, lo, hi)
        ts["cur_targets"] = ts["cur_targets"].at[:, self.actuated].set(tgt)
        ts["actions"] = actions
        ctrl = engine.Control.zero(m, n).replace(pos_target=ts["cur_targets"])

        if self.force_scale > 0.0:
            k_f, k_g = jax.random.split(jax.random.fold_in(state.rng, 43))
            decay = self.force_decay ** (self.dt / self.force_decay_interval)
            force = ts["rb_force"] * decay
            fire = jax.random.uniform(k_f, (n,)) < ts["force_prob"]
            new_force = (
                jax.random.normal(k_g, (n, 3)) * self.object_mass * self.force_scale
            )
            force = jnp.where(fire[:, None], new_force, force)
            ts["rb_force"] = force
            # LOCAL_SPACE force on the object (ref :705-709)
            quat = state.sim.body_quat[:, self.object_body]
            f_w = maths.quat_rotate(quat, force)
            wrench = jnp.zeros((n, m.nb, 6)).at[:, self.object_body, 3:6].set(f_w)
            ctrl = ctrl.replace(body_wrench=wrench)
        return ctrl, state.replace(ts=ts)

    # ------------------------------------------------------------------
    def _object_state(self, state):
        rs = root_state(self.model, state.sim)[:, self.object_actor]
        return rs[:, 0:3], rs[:, 3:7], rs[:, 7:10], rs[:, 10:13]

    def _fingertip_state(self, state):
        ft = self.fingertip_bodies
        sim = state.sim
        return jnp.concatenate(
            [
                sim.body_pos[:, ft], sim.body_quat[:, ft],
                sim.body_linvel[:, ft], sim.body_angvel[:, ft],
            ],
            axis=-1,
        )  # (N, 5, 13)

    def _fingertip_ft(self, state):
        """Force-torque sensor approximation: fingertip net contact wrench."""
        ft = self.fingertip_bodies
        return jnp.concatenate(
            [state.sim.contact_force[:, ft], state.sim.contact_torque[:, ft]], -1
        )  # (N, 5, 6)

    def _observations(self, state, actions):
        m = self.model
        ts = state.ts
        obj_pos, obj_rot, obj_linvel, obj_angvel = self._object_state(state)
        goal_rot = ts["goal_rot"]
        goal_pos = jnp.broadcast_to(self.goal_pos, obj_pos.shape)
        quat_diff = maths.quat_mul(obj_rot, maths.quat_conjugate(goal_rot))
        ft_state = self._fingertip_state(state)
        acts = ts["actions"]
        n = obj_pos.shape[0]

        if self.obs_type == "openai":
            return jnp.concatenate(
                [
                    ft_state[..., 0:3].reshape(n, 15),
                    obj_pos,
                    quat_diff,
                    acts,
                ],
                axis=-1,
            )
        dp = maths.unscale(dof_pos(m, state.sim), self.dof_lower, self.dof_upper)
        dv = dof_vel(m, state.sim)
        if self.obs_type == "full_no_vel":
            return jnp.concatenate(
                [
                    dp,
                    obj_pos, obj_rot, goal_pos, goal_rot, quat_diff,
                    ft_state[..., 0:3].reshape(n, 15),
                    acts,
                ],
                axis=-1,
            )
        if self.obs_type == "full":
            return jnp.concatenate(
                [
                    dp, self.vel_obs_scale * dv,
                    obj_pos, obj_rot, obj_linvel, self.vel_obs_scale * obj_angvel,
                    goal_pos, goal_rot, quat_diff,
                    ft_state.reshape(n, 65),
                    acts,
                ],
                axis=-1,
            )
        # full_state (also the asymmetric critic state)
        return jnp.concatenate(
            [
                dp, self.vel_obs_scale * dv,
                self.ft_obs_scale * state.sim.dof_force,
                obj_pos, obj_rot, obj_linvel, self.vel_obs_scale * obj_angvel,
                goal_pos, goal_rot, quat_diff,
                ft_state.reshape(n, 65),
                self.ft_obs_scale * self._fingertip_ft(state).reshape(n, 30),
                acts,
            ],
            axis=-1,
        )

    def _states(self, state, obs):
        if not self.asymmetric_obs:
            return None
        saved, self.obs_type = self.obs_type, "full_state"
        try:
            return self._observations(state, state.ts["actions"])
        finally:
            self.obs_type = saved

    # ------------------------------------------------------------------
    def _reward_done(self, state, obs, actions):
        """Port of compute_hand_reward (ref: shadow_hand.py:747-800)."""
        ts = dict(state.ts)
        obj_pos, obj_rot, _, _ = self._object_state(state)
        goal_dist = jnp.linalg.norm(obj_pos - self.goal_pos, axis=-1)
        quat_diff = maths.quat_mul(obj_rot, maths.quat_conjugate(ts["goal_rot"]))
        rot_dist = 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(quat_diff[:, 0:3], axis=-1), 0.0, 1.0)
        )

        dist_rew = goal_dist * self.dist_reward_scale
        rot_rew = 1.0 / (jnp.abs(rot_dist) + self.rot_eps) * self.rot_reward_scale
        action_penalty = jnp.sum(actions**2, axis=-1)
        reward = dist_rew + rot_rew + action_penalty * self.action_penalty_scale

        goal_resets = jnp.abs(rot_dist) <= self.success_tolerance
        successes = ts["successes"] + goal_resets
        reward = jnp.where(goal_resets, reward + self.reach_goal_bonus, reward)
        reward = jnp.where(goal_dist >= self.fall_dist, reward + self.fall_penalty, reward)

        resets = goal_dist >= self.fall_dist
        progress = state.progress
        if self.max_consecutive_successes > 0:
            progress = jnp.where(goal_resets, 0, progress)
            resets = resets | (successes >= self.max_consecutive_successes)
        timeout = progress >= self.max_episode_length - 1
        resets = resets | timeout
        if self.max_consecutive_successes > 0:
            reward = jnp.where(timeout, reward + 0.5 * self.fall_penalty, reward)

        num_resets = resets.sum()
        finished = (successes * resets).sum()
        cons = jnp.where(
            num_resets > 0,
            self.av_factor * finished / jnp.maximum(num_resets, 1)
            + (1.0 - self.av_factor) * ts["consecutive_successes"],
            ts["consecutive_successes"],
        )
        ts["successes"] = successes
        ts["consecutive_successes"] = cons
        ts["reset_goal"] = goal_resets
        state = state.replace(ts=ts, progress=progress)
        info = {"consecutive_successes": cons, "successes": successes.mean()}
        return state, reward, resets, info
