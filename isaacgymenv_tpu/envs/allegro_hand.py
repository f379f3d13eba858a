"""AllegroHand — 16-DOF in-hand cube reorientation (ShadowHand variant).

Behavioral spec (ref: tasks/allegro_hand.py):
- allegro_touch_sensor.urdf (16 revolute dofs, all actuated), fixed base at
  (0,0,0.5) rotated Ry(pi)*Rx(0.47pi)*Rz(0.25pi) (:283-285); per-dof drive
  effort 0.5, Kp 3, Kd 0.1 set by the task (:263-266).
- 6.5 cm cube (cube_multicolor_allegro.urdf) at dy=-0.2 dz=+0.06 (:290-293).
- obs (:437-...): full_no_vel 50 / full 72 / full_state 88 — no fingertip
  blocks; reward/reset/goal logic identical to ShadowHand.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.envs.shadow_hand import ShadowHand
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import DRIVE_POS, dof_pos, dof_vel
from isaacgymenv_tpu.physics.urdf import AssetOptions, load_urdf
from isaacgymenv_tpu.utils.config import asset_root


def _axis_angle_quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    s = math.sin(angle / 2)
    return np.array([axis[0] * s, axis[1] * s, axis[2] * s, math.cos(angle / 2)])


def _qmul(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


@register("AllegroHand")
class AllegroHand(ShadowHand):
    num_actions = 16

    hand_asset = "urdf/kuka_allegro_description/allegro_touch_sensor.urdf"
    hand_start = (0.0, 0.0, 0.5)
    object_offset = (0.0, -0.2, 0.06)  # ref: allegro_hand.py:290-293

    NUM_OBS = {"full_no_vel": 50, "full": 72, "full_state": 88}

    def __init__(self, cfg):
        cfg["env"].setdefault("observationType", "full_state")
        super().__init__(cfg)
        self.num_states = 88 if self.asymmetric_obs else 0

    def _object_asset(self, cfg):
        path = os.path.join(
            asset_root(), "urdf/objects/cube_multicolor_allegro.urdf"
        )
        return load_urdf(path, AssetOptions(density=400.0))

    def _build_model(self, cfg):
        # hand rotation: Ry(pi) * Rx(0.47pi) * Rz(0.25pi) (ref :285)
        q = _qmul(
            _qmul(
                _axis_angle_quat((0, 1, 0), math.pi),
                _axis_angle_quat((1, 0, 0), 0.47 * math.pi),
            ),
            _axis_angle_quat((0, 0, 1), 0.25 * math.pi),
        )
        mb, info = load_urdf(
            os.path.join(asset_root(), self.hand_asset),
            AssetOptions(fix_base_link=True, collapse_fixed_joints=False, density=1000.0),
            base_pos=self.hand_start,
            base_quat=tuple(q),
        )
        # per-dof drive props set by the task (ref: allegro_hand.py:263-266)
        for b in mb.bodies:
            if b.jtype in (1, 2):
                b.drive_mode = DRIVE_POS
                b.effort = 0.5
                b.stiffness = 3.0
                b.damping = 0.1
        ob, _ = self._object_asset(cfg)
        mb.merge(ob)
        mb.gravity = np.array(self.gravity)
        # fixed hand at z=0.5, fall-distance reset — ground unreachable
        # (see shadow_hand.py _build_model; SimModel.no_ground)
        mb.no_ground = True
        self.model = attach_effective_masses(mb.finalize())
        self._info = info
        self.object_actor = 1
        self.object_body = self.model.actor_root[1]
        self.actuated = np.arange(self.model.nd)
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)
        self.object_init = jnp.array(
            list(np.add(self.hand_start, self.object_offset)) + [0, 0, 0, 1] + [0.0] * 6,
            jnp.float32,
        )
        self.object_mass = float(self.model.body_mass[self.object_body])

    # ------------------------------------------------------------------
    def _observations(self, state, actions):
        m = self.model
        ts = state.ts
        obj_pos, obj_rot, obj_linvel, obj_angvel = self._object_state(state)
        goal_rot = ts["goal_rot"]
        goal_pos = jnp.broadcast_to(self.goal_pos, obj_pos.shape)
        quat_diff = maths.quat_mul(obj_rot, maths.quat_conjugate(goal_rot))
        acts = ts["actions"]
        dp = maths.unscale(dof_pos(m, state.sim), self.dof_lower, self.dof_upper)
        dv = dof_vel(m, state.sim)

        if self.obs_type == "full_no_vel":
            return jnp.concatenate(
                [dp, obj_pos, obj_rot, goal_pos, goal_rot, quat_diff, acts], -1
            )
        if self.obs_type == "full":
            return jnp.concatenate(
                [
                    dp, self.vel_obs_scale * dv,
                    obj_pos, obj_rot, obj_linvel, self.vel_obs_scale * obj_angvel,
                    goal_pos, goal_rot, quat_diff,
                    acts,
                ],
                axis=-1,
            )
        return jnp.concatenate(
            [
                dp, self.vel_obs_scale * dv,
                self.ft_obs_scale * state.sim.dof_force,
                obj_pos, obj_rot, obj_linvel, self.vel_obs_scale * obj_angvel,
                goal_pos, goal_rot, quat_diff,
                acts,
            ],
            axis=-1,
        )
