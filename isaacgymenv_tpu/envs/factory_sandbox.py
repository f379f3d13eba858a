"""FactoryTaskInsertion / FactoryTaskGears — sandbox scenes.

Behavioral spec: in the reference BOTH tasks are shipped as sandbox
skeletons — `_update_rew_buf` and `_update_reset_buf` are literally `pass`
and `compute_observations` returns the never-written (zero) obs buffer
(ref: tasks/factory/factory_task_insertion.py:108-125,
tasks/factory/factory_task_gears.py — identical shape); `pre_physics_step`
only stores the actions without applying control (:88-95), so the Franka
simply holds its PhysX PD targets from reset.  This module reproduces that
contract exactly: zero observations (32), zero reward, timeout-only resets
(max_episode_length 1024), held PD targets, and the scene objects reset
with the reference's noise spec (plug/gears XY noise 0.05, Y bias -0.1,
ref cfg/task/FactoryTaskInsertion.yaml / FactoryTaskGears.yaml).

Deviation: plug/socket and gear/shaft meshes are approximated by primitive
cylinders/boxes (the reference needs SDF meshes only for actual insertion
mechanics, which its shipped task logic never exercises).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import os

from isaacgymenv_tpu.envs.base import TaskEnv
from isaacgymenv_tpu.envs.factory_nut_bolt_pick import TABLE_H
from isaacgymenv_tpu.envs.franka_cube_stack import _add_box_actor
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.physics import builder as B
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import (
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

ARM_INIT_MID = None  # middle of joint limits (ref factory_task_insertion.py:136-160)


def _add_cylinder_actor(fb, name, radius, height, mass, fixed=False, pos=(0, 0, 0)):
    b = fb.add_body(
        name, -1, JT_FIXED if fixed else JT_FREE,
        joint_pos=pos if fixed else (0, 0, 0),
        mass=mass, inertia=B.cylinder_inertia(mass, radius, height),
    )
    fb.add_surface(b, B.ModelBuilder.SURF_CYLINDER, (0, 0, 0), None, (radius, height / 2, 0))
    if not fixed:
        for ang in np.linspace(0, 2 * math.pi, 6, endpoint=False):
            fb.add_geom_sphere(
                b,
                (radius * 0.7 * math.cos(ang), radius * 0.7 * math.sin(ang), 0.0),
                min(height / 2, radius * 0.3) * 0.9,
            )
    return b


class _FactorySandbox(TaskEnv):
    """Shared runtime for the reference's no-reward factory sandboxes."""

    num_obs = 32
    num_actions = 12
    objects: tuple = ()  # (name, radius, height, mass, fixed)

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 1024)))
        super().__init__(cfg)
        rnd = cfg.get("randomize", {})
        self.joint_noise = float(rnd.get("joint_noise", 0.0)) * math.pi / 180.0
        self.obj_bias_y = float(rnd.get("bias_y", -0.1))
        self.obj_bias_z = float(rnd.get("bias_z", 0.0))
        self.obj_noise_xy = float(rnd.get("noise_xy", 0.05))
        self._build_model(cfg)

    def _build_model(self, cfg):
        fb, finfo = load_urdf(
            os.path.join(
                asset_root(), "urdf/franka_description/robots/franka_panda_gripper.urdf"
            ),
            AssetOptions(fix_base_link=True, collapse_fixed_joints=False, density=1000.0),
            base_pos=(-0.45, 0.0, TABLE_H),
        )
        lowers, uppers = [], []
        for b in fb.bodies:
            b.gravcomp = 1.0
            if b.jtype in (1, 2):
                # gym_default PhysX PD (ref FactoryTaskInsertion.yaml ctrl)
                b.drive_mode, b.stiffness, b.damping = DRIVE_POS, 40.0, 8.0
                lowers.append(b.lower)
                uppers.append(b.upper)
        _add_box_actor(fb, "table", (0.6, 0.6, TABLE_H / 2), (0.0, 0.0, TABLE_H / 2), 100.0, fixed=True)
        self.obj_actors = []
        for name, radius, height, mass, fixed in self.objects:
            if name.startswith("base"):
                bb = _add_box_actor(
                    fb, name, (radius, radius, height / 2),
                    (0.0, 0.0, TABLE_H + height / 2), mass, fixed=True,
                )
            else:
                bb = _add_cylinder_actor(fb, name, radius, height, mass, fixed=fixed)
            if not fixed:
                self.obj_actors.append((len(fb.actor_roots) - 1, height, TABLE_H))
        self._extra_scene(fb, finfo)
        fb.gravity = np.array(self.gravity)
        self.model = attach_effective_masses(fb.finalize())
        # middle-of-limits arm pose (ref factory_task_insertion.py:143-150)
        lo = np.array(lowers[:7])
        hi = np.array(uppers[:7])
        mid = (lo + hi) * 0.5
        self.default_dof = jnp.array(list(mid) + [0.02, 0.02], jnp.float32)
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)

    def _extra_scene(self, fb, finfo):
        """Subclass hook: add non-primitive scene objects before finalize."""

    def _initial_ts(self, key):
        n = self.num_envs
        return {"hold_targets": jnp.broadcast_to(self.default_dof, (n, self.model.nd))}

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        mm = mask[:, None]
        k_dof, k_obj = jax.random.split(key)
        pos = jnp.clip(
            self.default_dof
            + self.joint_noise
            * jax.random.uniform(k_dof, (n, 1), minval=-1.0, maxval=1.0),
            self.dof_lower, self.dof_upper,
        )
        sim = set_dof_state(
            m, state.sim,
            jnp.where(mm, pos, dof_pos(m, state.sim)),
            jnp.where(mm, 0.0, dof_vel(m, state.sim)),
        )
        rs = root_state(m, sim)
        keys = jax.random.split(k_obj, max(len(self.obj_actors), 1))
        for (actor, height, z_base), kk in zip(self.obj_actors, keys):
            noise = self.obj_noise_xy * jax.random.uniform(
                kk, (n, 2), minval=-1.0, maxval=1.0
            )
            obj = (
                jnp.zeros((n, 13))
                .at[:, 0].set(noise[:, 0])
                .at[:, 1].set(self.obj_bias_y + noise[:, 1])
                .at[:, 2].set(z_base + self.obj_bias_z + height / 2 + 0.001)
                .at[:, 6].set(1.0)
            )
            rs = rs.at[:, actor].set(jnp.where(mm, obj, rs[:, actor]))
        sim = set_root_state(m, sim, rs)
        ts = dict(state.ts)
        ts["hold_targets"] = jnp.where(mm, pos, ts["hold_targets"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    def _make_control(self, state, actions):
        # ref pre_physics_step stores actions without applying control; the
        # PhysX PD holds the reset targets (:88-95)
        n = actions.shape[0]
        return engine.Control.zero(self.model, n).replace(
            pos_target=state.ts["hold_targets"]
        )

    def _observations(self, state, actions):
        # ref compute_observations returns the never-written obs buffer
        return jnp.zeros((self.num_envs, self.num_obs))

    def _reward_done(self, state, obs, actions):
        reward = jnp.zeros(self.num_envs)
        timeout = state.progress >= self.max_episode_length - 1
        return state, reward, timeout, {}


@register("FactoryTaskInsertion")
class FactoryTaskInsertion(_FactorySandbox):
    """Round peg + socket plate with a REAL mesh SDF collider.

    The socket is the reference's `factory_round_hole_8mm` mesh voxelized
    into a signed-distance grid (physics/sdf.py — the PhysX SDF collision
    equivalent, ref: factory_env_insertion.py assets + factory_base.py:483);
    the plug is the matching 8 mm round peg as a ring-of-spheres cylinder
    that can genuinely enter the hole.  Task logic stays the reference's
    sandbox contract (zero obs/reward — its `_update_rew_buf` is `pass`)."""

    objects = ()

    def _extra_scene(self, fb, finfo):
        from isaacgymenv_tpu.physics import sdf as sdf_mod
        from isaacgymenv_tpu.physics.types import JT_FIXED, JT_FREE

        mesh_dir = os.path.join(asset_root(), "factory/mesh/factory_insertion")
        hv, hf = sdf_mod.load_obj(
            os.path.join(mesh_dir, "factory_round_hole_8mm_subdiv_3x.obj")
        )
        dist, origin, spacing = sdf_mod.mesh_sdf_grid(hv, hf, res=64)
        plate_h = float(hv.max(0)[2] - hv.min(0)[2])
        socket = fb.add_body(
            "socket", -1, JT_FIXED,
            joint_pos=(0.0, self.obj_bias_y, TABLE_H - float(hv.min(0)[2])),
            mass=0.028,
            inertia=B.box_inertia(0.028, 0.025, 0.025, plate_h),
        )
        fb.add_sdf(socket, dist, origin, spacing, friction=1.0)

        pv, _pf = sdf_mod.load_obj(
            os.path.join(mesh_dir, "factory_round_peg_8mm_loose.obj")
        )
        rp = float(pv.max(0)[0])          # 4 mm shaft radius
        ph = float(pv.max(0)[2] - pv.min(0)[2])  # 50 mm length
        mass = 0.019
        plug = fb.add_body(
            "plug", -1, JT_FREE, mass=mass,
            inertia=B.cylinder_inertia(mass, rp, ph),
        )
        fb.add_surface(
            plug, B.ModelBuilder.SURF_CYLINDER, (0, 0, 0), None, (rp, ph / 2, 0)
        )
        # shaft as sphere rings: effective surface radius slightly under the
        # shaft (penalty contacts carry ~0.5 mm under load; keeps the loose
        # fit insertable through the trilinear-smoothed hole wall)
        rs = 0.0015
        ring_r = rp - rs - 0.0008
        # ring spacing below the socket plate thickness (9 mm) near the tip,
        # so the bore always constrains at least one ring during insertion
        tip = -ph / 2 + rs
        ring_zs = [tip + dz for dz in (0.0, 0.005, 0.010, 0.015, 0.020, 0.025)]
        ring_zs += [ph / 2 - rs - 0.01, ph / 2 - rs]
        for z in ring_zs:
            for ang in np.linspace(0, 2 * math.pi, 6, endpoint=False):
                fb.add_geom_sphere(
                    plug, (ring_r * math.cos(ang), ring_r * math.sin(ang), z), rs
                )
        fb.add_geom_sphere(plug, (0.0, 0.0, tip), rs)  # tip
        # plug resets above the socket plate (z_base = plate top)
        self.obj_actors.append(
            (len(fb.actor_roots) - 1, ph, TABLE_H + plate_h)
        )


@register("FactoryTaskGears")
class FactoryTaskGears(_FactorySandbox):
    # 3 gears + fixed base plate with shafts (ref factory_env_gears.py)
    objects = (
        ("gear_small", 0.02, 0.02, 0.05, False),
        ("gear_medium", 0.03, 0.02, 0.10, False),
        ("gear_large", 0.04, 0.02, 0.17, False),
        ("base_plate", 0.06, 0.01, 0.5, True),
    )
