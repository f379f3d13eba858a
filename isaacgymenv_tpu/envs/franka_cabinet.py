"""FrankaCabinet — Franka opens the top drawer of a sektion cabinet.

Behavioral spec (ref: tasks/franka_cabinet.py):
- Franka panda (9 dofs, PD pos drive Kp [400x7, 1e6x2], Kd [80x7, 100x2],
  finger effort 200, gravity-compensated :146-198) fixed at (1,0,0) facing
  the cabinet (quat (0,0,1,0)); sektion cabinet (4 dofs: 2 doors, 2 drawers,
  damping 10, armature 0.005) fixed at (0,0,0.4) (:210-216).
- act (N, 9): dof target velocities — targets += speed_scale * dt * action
  * actionScale(7.5), fingers at 0.1x speed (:446-452).
- obs (N, 23): franka dof pos scaled to [-1,1], dof vel * 0.1, drawer-grasp
  minus hand-grasp vector (3), drawer_top pos + vel (:360-385).
- grasp frames (:304-343): hand = panda_link7, finger midpoint + 0.04 in
  hand-frame y; drawer grasp = drawer_top body + (0.3, 0.01, 0).
- reward (:489-545): dist^-2 + orientation alignment (gripper forward vs
  drawer inward (-1,0,0), gripper up (0,1,0) vs drawer up (0,0,1)) +
  around-handle + finger-distance + drawer-open terms + open bonuses; -1
  style penalty when fingers slip behind; reset when drawer > 0.39 open.
- Shelf props (numProps, default 16 like the reference): free 8 cm boxes
  (density 400 -> 0.2048 kg) spawned in a sqrt-grid around the drawer_top
  pose (spacing 0.09, ref :265-288), reset to their spawn states on env
  reset (ref :403-409).  Pure physics clutter — no reward/obs coupling,
  exactly as in the reference.
- Deviation (documented): cabinet start-position noise is 0 in the shipped
  config and unsupported here (fixed bases are static).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import engine, kinematics
from isaacgymenv_tpu.physics.meff import attach_effective_masses
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

FRANKA_DEFAULT = (1.157, -1.066, -0.155, -2.239, -1.841, 1.003, 0.469, 0.035, 0.035)
PROP_SIZE = 0.08  # ref :69-71 prop_width/height/length
PROP_SPACING = 0.09  # ref :72


def _builder_zero_pos(mb, body: int) -> np.ndarray:
    """World position of a builder body at q=0 (all joints at their fixed
    offsets) — the pose `get_rigid_transform` reads before any dof write."""

    def qrot(q, v):
        u, w = q[:3], q[3]
        return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)

    p = np.zeros(3)
    q = np.array([0.0, 0.0, 0.0, 1.0])
    chain = []
    b = body
    while b >= 0:
        chain.append(b)
        b = mb.bodies[b].parent
    for b in reversed(chain):
        bb = mb.bodies[b]
        p = p + qrot(q, bb.joint_pos)
        qj = bb.joint_quat
        # quat multiply q * qj (xyzw)
        x1, y1, z1, w1 = q
        x2, y2, z2, w2 = qj
        q = np.array([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ])
    return p


@register("FrankaCabinet")
class FrankaCabinet(TaskEnv):
    num_obs = 23
    num_actions = 9

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 500)))
        super().__init__(cfg)
        self.action_scale = float(e.get("actionScale", 7.5))
        self.dof_vel_scale = float(e.get("dofVelocityScale", 0.1))
        self.dist_reward_scale = float(e.get("distRewardScale", 2.0))
        self.rot_reward_scale = float(e.get("rotRewardScale", 0.5))
        self.around_handle_reward_scale = float(e.get("aroundHandleRewardScale", 0.25))
        self.open_reward_scale = float(e.get("openRewardScale", 7.5))
        self.finger_dist_reward_scale = float(e.get("fingerDistRewardScale", 5.0))
        self.action_penalty_scale = float(e.get("actionPenaltyScale", 0.01))
        self.distX_offset = 0.04

        self._build_model(cfg)

    def _build_model(self, cfg):
        fb, finfo = load_urdf(
            os.path.join(asset_root(), "urdf/franka_description/robots/franka_panda.urdf"),
            AssetOptions(fix_base_link=True, collapse_fixed_joints=False, density=1000.0),
            base_pos=(1.0, 0.0, 0.0),
            base_quat=(0.0, 0.0, 1.0, 0.0),  # ref: franka_cabinet.py:210-212
        )
        stiff = [400.0] * 7 + [1.0e6] * 2
        damp = [80.0] * 7 + [100.0] * 2
        i = 0
        for b in fb.bodies:
            if b.jtype in (1, 2):
                b.drive_mode = DRIVE_POS
                b.stiffness = stiff[i]
                b.damping = damp[i]
                if i >= 7:
                    b.effort = 200.0  # ref :197-198
                i += 1
            b.gravcomp = 1.0  # disable_gravity (ref :149)
        cb, cinfo = load_urdf(
            os.path.join(
                asset_root(), "urdf/sektion_cabinet_model/urdf/sektion_cabinet_2.urdf"
            ),
            AssetOptions(fix_base_link=True, collapse_fixed_joints=False, armature=0.005),
            base_pos=(0.0, 0.0, 0.4),
        )
        for b in cb.bodies:
            if b.jtype in (1, 2):
                b.damping = 10.0  # ref :200-203
        off = fb.merge(cb)

        # shelf props: free boxes in a sqrt-grid at the drawer_top pose
        # (ref :205-208 create_box density 400; :260-288 grid placement)
        self.num_props = int(cfg["env"].get("numProps", 0))
        default_prop_states = []
        if self.num_props > 0:
            from isaacgymenv_tpu.envs.franka_cube_stack import _add_box_actor

            # drawer_top default world pose: FK of the pre-merge cabinet at
            # q=0 is just its static offsets — compute from the merged
            # builder's zero state below; positions only need the spawn pose
            drawer_p = _builder_zero_pos(fb, cinfo["link_body"]["drawer_top"] + off)
            ppr = int(np.ceil(np.sqrt(self.num_props)))
            spacing = PROP_SPACING
            half = PROP_SIZE / 2.0
            mass = 400.0 * PROP_SIZE**3  # ref box_opts.density = 400
            xmin = -0.5 * spacing * (ppr - 1)
            yzmin = -0.5 * spacing * (ppr - 1)
            count = 0
            prop_bodies = set()
            for j in range(ppr):
                prop_up = yzmin + j * spacing
                for k in range(ppr):
                    if count >= self.num_props:
                        break
                    propx = xmin + k * spacing
                    prop_bodies.add(
                        _add_box_actor(fb, f"prop{count}", (half,) * 3, None, mass)
                    )
                    default_prop_states.append(
                        [drawer_p[0] + propx, drawer_p[1] + prop_up, drawer_p[2],
                         0.0, 0.0, 0.0, 1.0, 0, 0, 0, 0, 0, 0]
                    )
                    count += 1
            # static broadphase: props interact with the cabinet, each other,
            # and the franka wrist/fingers (the links that can plausibly
            # sweep the shelf) — PhysX culls the same pairs at runtime;
            # pruning here bounds the static pair list (36 bodies would
            # otherwise make ~14k pairs/env)
            n_franka = off  # bodies [0, off) are the franka
            wrist = {
                finfo["link_body"][n]
                for n in ("panda_link6", "panda_link7", "panda_leftfinger",
                          "panda_rightfinger")
                if n in finfo["link_body"]
            }

            def _keep(gb, sb):
                a_prop, b_prop = gb in prop_bodies, sb in prop_bodies
                if not (a_prop or b_prop):
                    return True
                if a_prop and b_prop:
                    return True
                if a_prop:  # prop spheres vs cabinet surfaces + wrist
                    return sb >= n_franka or sb in wrist
                # surface side is the prop: only the wrist geoms collide
                # against prop boxes (prop-sphere-vs-cabinet-surface already
                # covers resting/pushing; the symmetric cabinet-geom
                # direction is redundant and triples the pair list)
                return gb in wrist

            fb.pair_filter = _keep
        fb.gravity = np.array(self.gravity)
        self.model = attach_effective_masses(fb.finalize())
        # actors: franka(0), cabinet(1), props 2.. (ref global_indices [:,2:])
        self.prop_actors = np.arange(2, 2 + self.num_props)
        self.default_prop_states = (
            jnp.array(default_prop_states, jnp.float32)
            if self.num_props else jnp.zeros((0, 13), jnp.float32)
        )
        names = self.model.body_names
        self.hand_body = finfo["link_body"]["panda_link7"]
        self.lfinger_body = finfo["link_body"]["panda_leftfinger"]
        self.rfinger_body = finfo["link_body"]["panda_rightfinger"]
        self.drawer_body = cinfo["link_body"]["drawer_top"] + off
        self.franka_dofs = np.arange(9)
        self.drawer_dof = self.model.dof_index("drawer_top_joint")
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)
        self.default_dof = jnp.array(FRANKA_DEFAULT, jnp.float32)
        self.speed_scales = jnp.array([1.0] * 7 + [0.1] * 2)

        # grasp frames from FK at q=0 (ref: init_data get_rigid_transform,
        # actors are created before any dof state is written)
        from isaacgymenv_tpu.physics.types import make_zero_state

        st = make_zero_state(self.model, 1)
        kin = kinematics.fk(self.model, st.q, st.qd)
        hand_p = np.asarray(kin.p_w[self.hand_body][0])
        hand_R = np.asarray(kin.R_w[self.hand_body][0])
        finger_mid = 0.5 * (
            np.asarray(kin.p_w[self.lfinger_body][0])
            + np.asarray(kin.p_w[self.rfinger_body][0])
        )
        lf_R = np.asarray(kin.R_w[self.lfinger_body][0])
        # local grasp = hand^-1 * finger_mid_pose + (0, 0.04, 0) (ref :317-321)
        local_p = hand_R.T @ (finger_mid - hand_p) + np.array([0.0, 0.04, 0.0])
        local_R = hand_R.T @ lf_R
        self.franka_local_grasp_pos = jnp.array(local_p, jnp.float32)
        self.franka_local_grasp_rot = jnp.array(
            maths.rotmat_to_quat(jnp.array(local_R)), jnp.float32
        )
        self.drawer_local_grasp_pos = jnp.array([0.3, 0.01, 0.0], jnp.float32)

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        return {
            "dof_targets": jnp.zeros((self.num_envs, self.model.nd)),
            "actions": jnp.zeros((self.num_envs, 9)),
        }

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        pos = jnp.clip(
            self.default_dof
            + 0.25 * (jax.random.uniform(key, (n, 9)) - 0.5),
            self.dof_lower[self.franka_dofs],
            self.dof_upper[self.franka_dofs],
        )
        full = jnp.zeros((n, m.nd)).at[:, self.franka_dofs].set(pos)
        mm = mask[:, None]
        sim = set_dof_state(
            m, state.sim,
            jnp.where(mm, full, dof_pos(m, state.sim)),
            jnp.where(mm, 0.0, dof_vel(m, state.sim)),
        )
        if self.num_props > 0:
            # reset props to their spawn grid (ref :403-409)
            rs = root_state(m, sim)
            defaults = jnp.broadcast_to(
                self.default_prop_states, (n, self.num_props, 13)
            )
            rs = rs.at[:, self.prop_actors].set(
                jnp.where(mask[:, None, None], defaults, rs[:, self.prop_actors])
            )
            sim = set_root_state(m, sim, rs)
        ts = dict(state.ts)
        ts["dof_targets"] = jnp.where(mm, full, ts["dof_targets"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    def _make_control(self, state, actions):
        m = self.model
        n = actions.shape[0]
        ts = dict(state.ts)
        tgt = ts["dof_targets"][:, self.franka_dofs] + (
            self.speed_scales * self.dt * actions * self.action_scale
        )
        tgt = jnp.clip(
            tgt, self.dof_lower[self.franka_dofs], self.dof_upper[self.franka_dofs]
        )
        ts["dof_targets"] = ts["dof_targets"].at[:, self.franka_dofs].set(tgt)
        ts["actions"] = actions
        return (
            engine.Control.zero(m, n).replace(pos_target=ts["dof_targets"]),
            state.replace(ts=ts),
        )

    # ------------------------------------------------------------------
    def _grasp_state(self, state):
        sim = state.sim
        hand_rot = sim.body_quat[:, self.hand_body]
        hand_pos = sim.body_pos[:, self.hand_body]
        drawer_rot = sim.body_quat[:, self.drawer_body]
        drawer_pos = sim.body_pos[:, self.drawer_body]
        fg_rot = maths.quat_mul(
            hand_rot, jnp.broadcast_to(self.franka_local_grasp_rot, hand_rot.shape)
        )
        fg_pos = hand_pos + maths.quat_rotate(
            hand_rot, jnp.broadcast_to(self.franka_local_grasp_pos, hand_pos.shape)
        )
        dg_rot = drawer_rot
        dg_pos = drawer_pos + maths.quat_rotate(
            drawer_rot, jnp.broadcast_to(self.drawer_local_grasp_pos, drawer_pos.shape)
        )
        return fg_rot, fg_pos, dg_rot, dg_pos

    def _observations(self, state, actions):
        m = self.model
        dp = dof_pos(m, state.sim)
        dv = dof_vel(m, state.sim)
        fdp = dp[:, self.franka_dofs]
        fdv = dv[:, self.franka_dofs]
        lo = self.dof_lower[self.franka_dofs]
        hi = self.dof_upper[self.franka_dofs]
        dof_scaled = 2.0 * (fdp - lo) / (hi - lo) - 1.0
        _, fg_pos, _, dg_pos = self._grasp_state(state)
        return jnp.concatenate(
            [
                dof_scaled,
                fdv * self.dof_vel_scale,
                dg_pos - fg_pos,
                dp[:, self.drawer_dof : self.drawer_dof + 1],
                dv[:, self.drawer_dof : self.drawer_dof + 1],
            ],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        """Port of compute_franka_reward (ref: franka_cabinet.py:489-545)."""
        m = self.model
        sim = state.sim
        fg_rot, fg_pos, dg_rot, dg_pos = self._grasp_state(state)
        lf_pos = sim.body_pos[:, self.lfinger_body]
        rf_pos = sim.body_pos[:, self.rfinger_body]
        drawer_open = dof_pos(m, sim)[:, self.drawer_dof]

        d = jnp.linalg.norm(fg_pos - dg_pos, axis=-1)
        dist_reward = (1.0 / (1.0 + d**2)) ** 2
        dist_reward = jnp.where(d <= 0.02, dist_reward * 2, dist_reward)

        def tf_vec(q, v):
            return maths.quat_rotate(q, jnp.broadcast_to(jnp.asarray(v, jnp.float32), q.shape[:-1] + (3,)))

        axis1 = tf_vec(fg_rot, (0, 0, 1.0))
        axis2 = tf_vec(dg_rot, (-1.0, 0, 0))
        axis3 = tf_vec(fg_rot, (0, 1.0, 0))
        axis4 = tf_vec(dg_rot, (0, 0, 1.0))
        dot1 = jnp.sum(axis1 * axis2, -1)
        dot2 = jnp.sum(axis3 * axis4, -1)
        rot_reward = 0.5 * (jnp.sign(dot1) * dot1**2 + jnp.sign(dot2) * dot2**2)

        around = (lf_pos[:, 2] > dg_pos[:, 2]) & (rf_pos[:, 2] < dg_pos[:, 2])
        around_handle_reward = 0.5 * around

        lf_d = jnp.abs(lf_pos[:, 2] - dg_pos[:, 2])
        rf_d = jnp.abs(rf_pos[:, 2] - dg_pos[:, 2])
        finger_dist_reward = jnp.where(around, (0.04 - lf_d) + (0.04 - rf_d), 0.0)

        action_penalty = jnp.sum(actions**2, -1)
        open_reward = drawer_open * around_handle_reward + drawer_open

        rewards = (
            self.dist_reward_scale * dist_reward
            + self.rot_reward_scale * rot_reward
            + self.around_handle_reward_scale * around_handle_reward
            + self.open_reward_scale * open_reward
            + self.finger_dist_reward_scale * finger_dist_reward
            - self.action_penalty_scale * action_penalty
        )
        rewards = jnp.where(drawer_open > 0.01, rewards + 0.5, rewards)
        rewards = jnp.where(drawer_open > 0.2, rewards + around_handle_reward, rewards)
        rewards = jnp.where(drawer_open > 0.39, rewards + 2.0 * around_handle_reward, rewards)
        bad_l = lf_pos[:, 0] < dg_pos[:, 0] - self.distX_offset
        bad_r = rf_pos[:, 0] < dg_pos[:, 0] - self.distX_offset
        rewards = jnp.where(bad_l | bad_r, -1.0, rewards)

        done = (drawer_open > 0.39) | (state.progress >= self.max_episode_length - 1)
        return state, rewards, done, {"episode": {"drawer_open": drawer_open.mean()}}
