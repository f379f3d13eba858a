"""AllegroKukaTwoArms — bimanual hand+arm manipulation (DexPBT).

Behavioral spec (ref: tasks/allegro_kuka/allegro_kuka_two_arms.py +
two-arms subtask wrappers):
- two kuka-allegro arms at x = -+armXOfs (1.1 m), rotated +-90deg about z to
  face each other (:597-610); object on a table between them; 46 dofs /
  46 actions.
- obs full_state (:176-216): per-arm dof/palm/fingertip blocks, keypoints
  relative to BOTH palms and to the goal, episode bookkeeping.
- target volume spans the space between the arms
  (origin [0,0,0.8], extent [[-0.2,0.2],[-0.5,0.5],[-0.12,0.25]], :242-246).
- Reorientation uses a reduced 4-corner keypoint set
  (two_arms_reorientation :48-54); Regrasping a single center keypoint.
- reward/curriculum machinery shared with the single-arm base.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.allegro_kuka import (
    FINGERTIP_OFFSETS,
    FINGERTIPS,
    KUKA_DEFAULT,
    OBJ_SIZE,
    PALM_OFFSET,
    AllegroKukaBase,
)
from isaacgymenv_tpu.envs.franka_cube_stack import _add_box_actor
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import DRIVE_POS, dof_pos, dof_vel, root_state
from isaacgymenv_tpu.physics.urdf import AssetOptions, load_urdf
from isaacgymenv_tpu.utils.config import asset_root


class AllegroKukaTwoArmsBase(AllegroKukaBase):
    num_actions = 46

    def __init__(self, cfg):
        e = cfg["env"]
        self.arm_x_ofs = float(e.get("armXOfs", 1.1))
        self.arm_y_ofs = float(e.get("armYOfs", 0.0))
        super().__init__(cfg)
        # two-arm full state (ref two_arms :176-216)
        self.num_obs = (
            46 + 46               # dof pos/vel
            + 2 * 3 + 2 * 10      # palms
            + 10                  # object rot/vel/angvel
            + 2 * 12              # fingertips rel object
            + 2 * self.num_keypoints * 3  # keypoints rel both palms
            + self.num_keypoints * 3      # keypoints rel goal
            + 3 + 1 + 1 + 2 + 1
        )
        self.volume_origin = jnp.array([0.0, 0.0, 0.8])
        self.volume_extent = jnp.array([[-0.2, 0.2], [-0.5, 0.5], [-0.12, 0.25]])
        self.object_init_pos = jnp.array([0.0, self.arm_y_ofs, 0.67], jnp.float32)

    def _build_model(self, cfg):
        path = os.path.join(
            asset_root(), "urdf/kuka_allegro_description/kuka_allegro_touch_sensor.urdf"
        )

        def arm(x_sign):
            yaw = math.pi / 2 * (-x_sign)
            quat = (0.0, 0.0, math.sin(yaw / 2), math.cos(yaw / 2))
            mb, info = load_urdf(
                path,
                AssetOptions(fix_base_link=True, collapse_fixed_joints=False, density=1000.0),
                base_pos=(x_sign * self.arm_x_ofs, self.arm_y_ofs, 0.0),
                base_quat=quat,
            )
            for b in mb.bodies:
                if b.jtype in (1, 2):
                    b.drive_mode = DRIVE_POS
                    b.stiffness, b.damping, b.effort = 40.0, 5.0, 300.0 if b.joint_name.startswith("iiwa") else 0.35
            return mb, info

        mb, info0 = arm(-1)
        mb2, info1 = arm(+1)
        off = mb.merge(mb2)
        _add_box_actor(mb, "table", (0.6, 0.4, 0.19), (0.0, self.arm_y_ofs, 0.19), 50.0, fixed=True)
        m = OBJ_SIZE**3 * 1000.0
        self.object_body = _add_box_actor(mb, "object", (OBJ_SIZE / 2,) * 3, None, m)
        mb.gravity = np.array(self.gravity)
        self.model = attach_effective_masses(mb.finalize())
        self._info = info0
        self.fingertip_bodies = np.array(
            [info0["link_body"][f] for f in FINGERTIPS]
            + [info1["link_body"][f] + off for f in FINGERTIPS]
        )
        self.palm_bodies = np.array(
            [info0["link_body"]["palm_link"], info1["link_body"]["palm_link"] + off]
        )
        self.palm_body = self.palm_bodies[0]
        self.object_actor = self.model.n_actors - 1
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)
        self.default_dof = jnp.concatenate(
            [jnp.zeros(23).at[:7].set(jnp.array(KUKA_DEFAULT))] * 2
        )
        # per-env object scales + batched geometry (object-dimension DR)
        self._setup_object_scales(cfg)

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        ts = super()._initial_ts(key)
        n = self.num_envs
        ts["cur_targets"] = jnp.zeros((n, 46))
        ts["actions"] = jnp.zeros((n, 46))
        ts["closest_ft_dist"] = jnp.full((n, 8), -1.0)
        return ts

    def _reset_envs(self, state, mask, key):
        # reuse the base flow; arm dof noise spans both arms
        self.reset_dof_noise_arm_vec = None
        m = self.model
        n = mask.shape[0]
        k_obj, k_rot, k_dof, k_goal = jax.random.split(key, 4)
        mm = mask[:, None]
        ts = dict(state.ts)

        nx, ny, nz = self.reset_noise
        noise = jax.random.uniform(k_obj, (n, 3), minval=-1.0, maxval=1.0) * jnp.array([nx, ny, nz])
        yaw = jax.random.uniform(k_rot, (n,), minval=-jnp.pi, maxval=jnp.pi)
        zu = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (n, 3))
        quat = maths.quat_from_angle_axis(yaw, zu)
        obj = (
            jnp.zeros((n, 13))
            .at[:, 0:3].set(self.object_init_pos + noise)
            .at[:, 3:7].set(quat)
        )
        from isaacgymenv_tpu.physics.types import set_dof_state, set_root_state

        rs = root_state(m, state.sim)
        rs = rs.at[:, self.object_actor].set(jnp.where(mm, obj, rs[:, self.object_actor]))
        sim = set_root_state(m, state.sim, rs)

        dn = jnp.concatenate(
            [jnp.full((7,), self.reset_dof_noise_arm), jnp.full((16,), self.reset_dof_noise_fingers)] * 2
        )
        pos = jnp.clip(
            self.default_dof + dn * jax.random.uniform(k_dof, (n, 46), minval=-1.0, maxval=1.0),
            self.dof_lower, self.dof_upper,
        )
        sim = set_dof_state(
            m, sim,
            jnp.where(mm, pos, dof_pos(m, sim)),
            jnp.where(mm, 0.0, dof_vel(m, sim)),
        )
        gp, gr = self._sample_goal(k_goal, n)
        ts["goal_pos"] = jnp.where(mm, gp, ts["goal_pos"])
        ts["goal_rot"] = jnp.where(mm, gr, ts["goal_rot"])
        ts["cur_targets"] = jnp.where(mm, pos, ts["cur_targets"])
        ts["lifted"] = jnp.where(mask, False, ts["lifted"])
        ts["closest_kp_dist"] = jnp.where(mask, -1.0, ts["closest_kp_dist"])
        ts["closest_ft_dist"] = jnp.where(mm, -1.0, ts["closest_ft_dist"])
        ts["near_goal_steps"] = jnp.where(mask, 0, ts["near_goal_steps"])
        ts["prev_ep_successes"] = jnp.where(mask, ts["successes"], ts["prev_ep_successes"])
        ts["successes"] = jnp.where(mask, 0.0, ts["successes"])
        ts["object_init_z"] = jnp.where(mask, obj[:, 2], ts["object_init_z"])
        return state.replace(sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts)

    # ------------------------------------------------------------------
    def _scene(self, state):
        m = self.model
        sim = state.sim
        rs = root_state(m, sim)[:, self.object_actor]
        palm_pos = sim.body_pos[:, self.palm_bodies]       # (N, 2, 3)
        palm_rot = sim.body_quat[:, self.palm_bodies]
        off = jnp.broadcast_to(jnp.asarray(PALM_OFFSET), palm_pos.shape)
        palm_center = palm_pos + maths.quat_rotate(palm_rot, off)
        ft = self.fingertip_bodies
        ft_pos = sim.body_pos[:, ft]
        ft_rot = sim.body_quat[:, ft]
        tip_off = jnp.broadcast_to(
            jnp.asarray(np.tile(FINGERTIP_OFFSETS, (2, 1))), ft_pos.shape
        )
        ft_tip = ft_pos + maths.quat_rotate(ft_rot, tip_off)
        kp = self.kp_offsets  # (N, K, 3): per-env under object-dimension DR
        obj_rot_rep = jnp.broadcast_to(rs[:, None, 3:7], rs.shape[:-1] + (self.num_keypoints, 4))
        goal_rot_rep = jnp.broadcast_to(
            state.ts["goal_rot"][:, None], rs.shape[:-1] + (self.num_keypoints, 4)
        )
        obj_kp = rs[:, None, 0:3] + maths.quat_rotate(obj_rot_rep, kp)
        goal_kp = state.ts["goal_pos"][:, None] + maths.quat_rotate(goal_rot_rep, kp)
        return rs, palm_center, palm_pos, palm_rot, ft_tip, obj_kp, goal_kp

    def _observations(self, state, actions):
        m = self.model
        ts = state.ts
        sim = state.sim
        rs, palm_center, palm_pos, palm_rot, ft_tip, obj_kp, goal_kp = self._scene(state)
        n = rs.shape[0]
        dp = maths.unscale(dof_pos(m, sim), self.dof_lower, self.dof_upper)
        dv = dof_vel(m, sim)
        palm_state = jnp.concatenate(
            [palm_rot, sim.body_linvel[:, self.palm_bodies], sim.body_angvel[:, self.palm_bodies]], -1
        ).reshape(n, -1)
        ft_rel = (ft_tip - rs[:, None, 0:3]).reshape(n, -1)
        kp_rel_palms = (
            obj_kp[:, None] - palm_center[:, :, None]
        ).reshape(n, -1)  # keypoints rel BOTH palms
        kp_rel_goal = (obj_kp - goal_kp).reshape(n, -1)
        kp_max_dist = jnp.linalg.norm(obj_kp - goal_kp, axis=-1).max(-1)
        closest_kp = jnp.where(ts["closest_kp_dist"] < 0, kp_max_dist, ts["closest_kp_dist"])
        near_goal = kp_max_dist <= ts["success_tolerance"] * self.keypoint_scale
        obs = jnp.concatenate(
            [
                dp, dv,
                palm_center.reshape(n, -1), palm_state,
                jnp.concatenate([rs[:, 3:7], rs[:, 7:10], rs[:, 10:13]], -1),
                ft_rel,
                kp_rel_palms, kp_rel_goal,
                jnp.asarray(self.object_scales),  # per-env cuboid scales
                closest_kp[:, None],
                ts["lifted"][:, None].astype(jnp.float32),
                jnp.stack(
                    [state.progress.astype(jnp.float32) / self.max_episode_length, ts["successes"]], -1
                ),
                near_goal[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )
        return jnp.clip(obs, -self.clamp_abs_obs, self.clamp_abs_obs)

    def _reward_done(self, state, obs, actions):
        # base reward works off _scene; adapt closest_ft (8 tips) and
        # dof-velocity penalties (both arms)
        m = self.model
        ts = dict(state.ts)
        rs, palm_center, _, _, ft_tip, obj_kp, goal_kp = self._scene(state)
        dv = dof_vel(m, state.sim)

        z_lift = 0.05 + rs[:, 2] - ts["object_init_z"]
        lifting_rew = jnp.clip(z_lift, 0.0, 0.5)
        lifted = (z_lift > self.lifting_bonus_threshold) | ts["lifted"]
        just_lifted = lifted & ~ts["lifted"]
        lift_bonus = self.lifting_bonus * just_lifted
        lifting_rew = lifting_rew * ~lifted

        ft_dist = jnp.linalg.norm(ft_tip - rs[:, None, 0:3], axis=-1)
        closest_ft = jnp.where(ts["closest_ft_dist"] < 0, ft_dist, ts["closest_ft_dist"])
        ft_deltas = jnp.clip(closest_ft - ft_dist, 0.0, 10.0)
        ts["closest_ft_dist"] = jnp.minimum(closest_ft, ft_dist)
        ft_delta_rew = ft_deltas.sum(-1) * ~lifted

        kp_max_dist = jnp.linalg.norm(obj_kp - goal_kp, axis=-1).max(-1)
        closest_kp = jnp.where(ts["closest_kp_dist"] < 0, kp_max_dist, ts["closest_kp_dist"])
        kp_deltas = jnp.clip(closest_kp - kp_max_dist, 0.0, 100.0)
        ts["closest_kp_dist"] = jnp.minimum(closest_kp, kp_max_dist)
        keypoint_rew = kp_deltas * lifted

        near_goal = kp_max_dist <= ts["success_tolerance"] * self.keypoint_scale
        near_goal_steps = ts["near_goal_steps"] + near_goal
        is_success = near_goal_steps >= self.success_steps
        ts["near_goal_steps"] = jnp.where(is_success, 0, near_goal_steps)
        ts["successes"] = ts["successes"] + is_success
        ts["lifted"] = lifted

        arm_dofs = jnp.concatenate([dv[:, 0:7], dv[:, 23:30]], -1)
        hand_dofs = jnp.concatenate([dv[:, 7:23], dv[:, 30:46]], -1)
        kuka_pen = -jnp.sum(jnp.abs(arm_dofs), -1) * self.kuka_pen
        allegro_pen = -jnp.sum(jnp.abs(hand_dofs), -1) * self.allegro_pen
        bonus = near_goal * (self.reach_goal_bonus / self.success_steps)

        reward = (
            ft_delta_rew * self.distance_delta_rew_scale
            + lifting_rew * self.lifting_rew_scale
            + lift_bonus
            + keypoint_rew * self.keypoint_rew_scale
            + kuka_pen + allegro_pen + bonus
        )
        resets = rs[:, 2] < 0.1
        progress = state.progress
        if self.max_consecutive_successes > 0:
            progress = jnp.where(is_success, 0, progress)
            resets = resets | (ts["successes"] >= self.max_consecutive_successes)
        resets = resets | (progress >= self.max_episode_length - 1)

        due = (ts["frame"] - ts["last_curriculum_update"]) >= self.tol_interval
        good = ts["prev_ep_successes"].mean() >= 3.0
        new_tol = jnp.maximum(ts["success_tolerance"] * self.tol_increment, self.target_tolerance)
        ts["success_tolerance"] = jnp.where(due & good, new_tol, ts["success_tolerance"])
        ts["last_curriculum_update"] = jnp.where(due & good, ts["frame"], ts["last_curriculum_update"])

        tol_obj = (self.initial_tolerance - ts["success_tolerance"]) / max(
            self.initial_tolerance - self.target_tolerance, 1e-9
        )
        at_target = ts["success_tolerance"] <= self.target_tolerance
        true_objective = jnp.where(at_target, 1.0 + ts["successes"], tol_obj + 0.01 * ts["successes"])

        k_goal = jax.random.fold_in(state.rng, 61)
        gp, gr = self._sample_goal(k_goal, rs.shape[0])
        ts["goal_pos"] = jnp.where(is_success[:, None], gp, ts["goal_pos"])
        ts["goal_rot"] = jnp.where(is_success[:, None], gr, ts["goal_rot"])
        ts["closest_kp_dist"] = jnp.where(is_success, -1.0, ts["closest_kp_dist"])

        info = {
            "true_objective": true_objective.mean(),
            "episode": {
                "successes": ts["successes"].mean(),
                "tolerance": ts["success_tolerance"],
                "lifted": lifted.mean(),
            },
        }
        return state.replace(ts=ts, progress=progress), reward, resets, info


@register("AllegroKukaTwoArmsReorientation")
class AllegroKukaTwoArmsReorientation(AllegroKukaTwoArmsBase):
    def _object_keypoint_offsets(self):
        # reduced corner set (ref two_arms_reorientation :48-54)
        return [[1, 1, 1], [1, 1, -1], [-1, -1, 1], [-1, -1, -1]]

    def _sample_goal(self, key, n):
        k1, k2 = jax.random.split(key)
        lo = self.volume_origin + self.volume_extent[:, 0]
        hi = self.volume_origin + self.volume_extent[:, 1]
        pos = lo + jax.random.uniform(k1, (n, 3)) * (hi - lo)
        rot = maths.quat_unit(jax.random.normal(k2, (n, 4)))
        return pos, rot


@register("AllegroKukaTwoArmsRegrasping")
class AllegroKukaTwoArmsRegrasping(AllegroKukaTwoArmsBase):
    def _object_keypoint_offsets(self):
        return [[0, 0, 0]]

    def _sample_goal(self, key, n):
        lo = self.volume_origin + self.volume_extent[:, 0]
        hi = self.volume_origin + self.volume_extent[:, 1]
        pos = lo + jax.random.uniform(key, (n, 3)) * (hi - lo)
        return pos, jnp.zeros((n, 4)).at[:, 3].set(1.0)
