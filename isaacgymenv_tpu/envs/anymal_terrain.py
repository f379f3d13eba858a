"""AnymalTerrain — curriculum heightfield locomotion (the flagship task).

Behavioral spec from the reference (ref: tasks/anymal_terrain.py,
cfg/task/AnymalTerrain.yaml):
- obs (N, 188): [lin_vel*2, ang_vel*.25, projected_gravity (inverse-rotated
  here, :298), commands[:3]*scale, dof_pos*1.0 (raw), dof_vel*.05,
  140 height samples clip(root_z-0.5-h, +-1)*5, actions] (:303-314)
- additive uniform obs noise via noise_scale_vec (:174-186)
- act: PD torque control, clip +-80, Kp80/Kd2 recomputed per sim dt inside
  the decimation loop (:441-451) == our DRIVE_POS at substep rate
- 13-term reward with per-term episode sums (:315-382), clip >= 0, terminal
  reward on non-timeout resets
- commands (N,4): [vx, vy, yaw_rate, heading]; yaw_rate is recomputed each
  step as 0.5*wrap_to_pi(heading - base_heading) clipped +-1 (:462-465)
- immediate reset ordering: reward from pre-reset state (:448-476)
- terrain: 10 levels x 20 types sub-terrain grid with curriculum promotion
  by distance walked (:427-435), per-env spawn origins, pushes every 15 s
  (:437-439), per-env friction buckets of 100 (:235-239)
- QUIRK not replicated (documented, SURVEY.md §quirks): the reference runs
  one extra gym.simulate after the decimation loop (5 physics steps per
  control step); we run exactly `decimation` worth of sim time.
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
from isaacgymenv_tpu.physics.contact import Heightfield
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
from isaacgymenv_tpu.utils.terrain import TerrainGrid

REW_TERMS = [
    "lin_vel_xy", "ang_vel_z", "lin_vel_z", "ang_vel_xy", "orient",
    "torques", "joint_acc", "base_height", "air_time", "collision",
    "stumble", "action_rate", "hip",
]


@register("AnymalTerrain")
class AnymalTerrain(TaskEnv):
    num_obs = 188
    num_actions = 12
    reset_timing = "immediate"
    base_height_target = 0.52  # ref: anymal_terrain.py:347

    def __init__(self, cfg):
        e = cfg["env"]
        learn = e["learn"]
        control = e["control"]
        self.decimation = int(control["decimation"])
        sim_dt = float(cfg["sim"]["dt"])
        dt = self.decimation * sim_dt  # control dt (ref: :93-94)
        e["maxEpisodeLength"] = int(float(learn["episodeLength_s"]) / dt + 0.5)
        e.setdefault("controlFrequencyInv", 1)
        cfg["sim"] = dict(cfg["sim"])
        cfg["sim"]["dt"] = dt  # base-class dt = control period
        super().__init__(cfg)
        self.sim_dt = sim_dt
        # substeps interpreted per control step (decimation * inner substeps)
        self.substeps = int(cfg["sim"].get("substeps", 8))

        self.lin_vel_scale = float(learn["linearVelocityScale"])
        self.ang_vel_scale = float(learn["angularVelocityScale"])
        self.dof_pos_scale = float(learn["dofPositionScale"])
        self.dof_vel_scale = float(learn["dofVelocityScale"])
        self.height_meas_scale = float(learn["heightMeasurementScale"])
        self.action_scale = float(control["actionScale"])
        self.Kp = float(control["stiffness"])
        self.Kd = float(control["damping"])
        self.allow_knee_contacts = bool(learn["allowKneeContacts"])
        self.push_interval = int(float(learn["pushInterval_s"]) / dt + 0.5)
        self.push_enabled = bool(learn.get("pushRobots", True))
        self.max_episode_length_s = float(learn["episodeLength_s"])

        self.rew_scales = {
            "termination": float(learn["terminalReward"]) * dt,
            "lin_vel_xy": float(learn["linearVelocityXYRewardScale"]) * dt,
            "lin_vel_z": float(learn["linearVelocityZRewardScale"]) * dt,
            "ang_vel_z": float(learn["angularVelocityZRewardScale"]) * dt,
            "ang_vel_xy": float(learn["angularVelocityXYRewardScale"]) * dt,
            "orient": float(learn["orientationRewardScale"]) * dt,
            "torques": float(learn["torqueRewardScale"]) * dt,
            "joint_acc": float(learn["jointAccRewardScale"]) * dt,
            "base_height": float(learn["baseHeightRewardScale"]) * dt,
            "air_time": float(learn["feetAirTimeRewardScale"]) * dt,
            "collision": float(learn["kneeCollisionRewardScale"]) * dt,
            "stumble": float(learn["feetStumbleRewardScale"]) * dt,
            "action_rate": float(learn["actionRateRewardScale"]) * dt,
            "hip": float(learn["hipRewardScale"]) * dt,
        }
        self.command_ranges = e["randomCommandVelocityRanges"]
        self.base_init_state = jnp.array(
            list(e["baseInitState"]["pos"]) + list(e["baseInitState"]["rot"])
            + list(e["baseInitState"]["vLinear"]) + list(e["baseInitState"]["vAngular"]),
            jnp.float32,
        )

        # --- terrain ---
        tcfg = e["terrain"]
        self.terrain_cfg = tcfg
        self.curriculum = bool(tcfg.get("curriculum", True))
        self.terrain_type = tcfg.get("terrainType", "plane")
        seed = int(cfg.get("seed", 0))
        if self.terrain_type == "trimesh":
            grid = TerrainGrid(tcfg, self.num_envs, seed=seed)
            self.terrain = Heightfield(
                heights=jnp.array(
                    grid.height_field_raw.astype(np.float32) * grid.vertical_scale
                ),
                hscale=grid.horizontal_scale,
                border_x=-grid.border_size,
                border_y=-grid.border_size,
            )
            self.terrain_origins = jnp.array(grid.env_origins, jnp.float32)
            self.env_length = grid.env_length
            self.num_levels = grid.env_rows
            self.num_types = grid.env_cols
        else:
            self.terrain = None
            self.terrain_origins = None
            self.num_levels = int(tcfg.get("numLevels", 1))
            self.num_types = int(tcfg.get("numTerrains", 1))
            self.env_length = float(tcfg.get("mapLength", 8.0))
        self.max_init_level = int(tcfg.get("maxInitMapLevel", 0))
        if not self.curriculum:
            self.max_init_level = self.num_levels - 1

        self._build_model(cfg)

        named = e["defaultJointAngles"]
        self.default_dof_pos = jnp.array(
            [float(named.get(n, 0.0)) for n in self.model.dof_names], jnp.float32
        )
        names = self.model.body_names
        foot_name = e["urdfAsset"].get("footName", "SHANK")
        knee_name = e["urdfAsset"].get("kneeName", "THIGH")
        self.base_index = names.index(e["urdfAsset"].get("baseName", names[0]))
        self.feet_indices = np.array([i for i, n in enumerate(names) if foot_name in n])
        self.knee_indices = np.array([i for i, n in enumerate(names) if knee_name in n])
        self.hip_dofs = np.array([0, 3, 6, 9])

        # 140-point height scan grid (ref: init_height_points :503-513)
        y = 0.1 * np.array([-5, -4, -3, -2, -1, 1, 2, 3, 4, 5])
        x = 0.1 * np.array([-8, -7, -6, -5, -4, -3, -2, 2, 3, 4, 5, 6, 7, 8])
        gx, gy = np.meshgrid(x, y, indexing="ij")
        self.num_height_points = gx.size
        self.height_points = jnp.array(
            np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1), jnp.float32
        )

        self._noise_vec = self._make_noise_vec(learn)
        self.add_noise = bool(learn.get("addNoise", False))

    # ------------------------------------------------------------------
    def _configure_drives(self, mb):
        """Set drive modes/gains on the ModelBuilder (subclass hook)."""
        for b in mb.bodies:
            b.drive_mode = DRIVE_POS
            b.stiffness = self.Kp
            b.damping = self.Kd
            b.effort = 80.0  # torque clip (ref: anymal_terrain.py:445)

    def _build_model(self, cfg):
        e = cfg["env"]
        asset_cfg = e["urdfAsset"]
        path = os.path.join(asset_root(), asset_cfg["file"])
        mb, info = load_urdf(
            path,
            AssetOptions(
                fix_base_link=bool(asset_cfg.get("fixBaseLink", False)),
                collapse_fixed_joints=bool(asset_cfg.get("collapseFixedJoints", True)),
                density=0.001,
            ),
            friction=float(e["terrain"].get("staticFriction", 1.0)),
        )
        self._configure_drives(mb)
        contact = cfg.get("sim", {}).get("contact", {})
        mb.contact_stiffness = float(contact.get("stiffness", 30000.0))
        mb.contact_damping = float(contact.get("damping", 60000.0))
        mb.tangential_stiffness = float(contact.get("tangential_stiffness", 1.0e6))
        mb.gravity = np.array(self.gravity)
        model = mb.finalize()
        from isaacgymenv_tpu.physics.meff import attach_effective_masses

        model = attach_effective_masses(model)

        # per-env friction buckets (ref: :235-239 — 100 buckets)
        learn = e["learn"]
        if bool(learn.get("randomizeFriction", False)):
            lo, hi = learn["frictionRange"]
            rng = np.random.default_rng(int(cfg.get("seed", 0)) + 17)
            buckets = rng.uniform(lo, hi, size=(100,))
            per_env = buckets[np.arange(self.num_envs) % 100]
            gf = np.asarray(model.geom_friction)[None, :] * 0 + per_env[:, None]
            model = model.replace(geom_friction=jnp.array(gf, jnp.float32))
        self.model = model
        self._info = info

    def _make_noise_vec(self, learn):
        lvl = float(learn.get("noiseLevel", 1.0))
        v = np.zeros(self.num_obs, np.float32)
        v[0:3] = float(learn["linearVelocityNoise"]) * lvl * self.lin_vel_scale
        v[3:6] = float(learn["angularVelocityNoise"]) * lvl * self.ang_vel_scale
        v[6:9] = float(learn["gravityNoise"]) * lvl
        v[9:12] = 0.0
        v[12:24] = float(learn["dofPositionNoise"]) * lvl * self.dof_pos_scale
        v[24:36] = float(learn["dofVelocityNoise"]) * lvl * self.dof_vel_scale
        v[36:176] = float(learn["heightMeasurementNoise"]) * lvl * self.height_meas_scale
        v[176:188] = 0.0
        return jnp.array(v)

    def _obs_noise(self, key, obs):
        if not self.add_noise:
            return obs
        return obs + (2.0 * jax.random.uniform(key, obs.shape) - 1.0) * self._noise_vec

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        k1, k2 = jax.random.split(key)
        levels = jax.random.randint(k1, (n,), 0, self.max_init_level + 1)
        types = jax.random.randint(k2, (n,), 0, self.num_types)
        ts = {
            "commands": jnp.zeros((n, 4)),
            "actions": jnp.zeros((n, self.num_actions)),
            "last_actions": jnp.zeros((n, self.num_actions)),
            "last_dof_vel": jnp.zeros((n, self.model.nd)),
            "feet_air_time": jnp.zeros((n, len(self.feet_indices))),
            "terrain_levels": levels,
            "terrain_types": types,
            "last_reset_distance": jnp.zeros(()),
            "common_step": jnp.zeros((), jnp.int32),
            "init_done": jnp.zeros((), bool),
        }
        for k in REW_TERMS:
            ts[f"epsum_{k}"] = jnp.zeros(n)
        return ts

    def _env_origins(self, levels, types):
        if self.terrain_origins is None:
            return jnp.zeros((levels.shape[0], 3))
        return self.terrain_origins[levels, types]

    def _resample_commands(self, key, n):
        kx, ky, kw = jax.random.split(key, 3)
        r = self.command_ranges
        cx = jax.random.uniform(kx, (n,), minval=r["linear_x"][0], maxval=r["linear_x"][1])
        cy = jax.random.uniform(ky, (n,), minval=r["linear_y"][0], maxval=r["linear_y"][1])
        heading = jax.random.uniform(kw, (n,), minval=r["yaw"][0], maxval=r["yaw"][1])
        cmd = jnp.stack([cx, cy, jnp.zeros_like(cx), heading], axis=-1)
        # zero small commands (ref: :305)
        keep = (jnp.linalg.norm(cmd[:, :2], axis=-1) > 0.25)[:, None]
        return cmd * keep

    def _reset_envs(self, state, mask, key):
        n = mask.shape[0]
        k_pos, k_vel, k_cmd, k_xy = jax.random.split(key, 4)
        m = self.model
        ts = dict(state.ts)

        # terrain curriculum update (ref: update_terrain_level :427-435)
        rs = root_state(m, state.sim)[:, 0]
        if self.terrain_origins is not None:
            origins_now = self._env_origins(ts["terrain_levels"], ts["terrain_types"])
            distance = jnp.linalg.norm(rs[:, :2] - origins_now[:, :2], axis=-1)
            cmd_dist = (
                jnp.linalg.norm(ts["commands"][:, :2], axis=-1)
                * self.max_episode_length_s
                * 0.25
            )
            lv = ts["terrain_levels"]
            do_update = mask & ts["init_done"] & self.curriculum
            lv = lv - jnp.where(do_update & (distance < cmd_dist), 1, 0)
            lv = lv + jnp.where(do_update & (distance > self.env_length / 2), 1, 0)
            lv = jnp.clip(lv, 0, None) % self.num_levels
            ts["terrain_levels"] = lv
            # diagnostic channel: mean distance walked by envs resetting now
            # (the quantity the curriculum promotes on; threshold env_length/2)
            nm = jnp.maximum(mask.sum(), 1)
            ts["last_reset_distance"] = jnp.where(
                mask.any(), (distance * mask).sum() / nm,
                ts["last_reset_distance"],
            )

        new_pos = self.default_dof_pos * jax.random.uniform(
            k_pos, (n, m.nd), minval=0.5, maxval=1.5
        )
        new_vel = jax.random.uniform(k_vel, (n, m.nd), minval=-0.1, maxval=0.1)
        mm = mask[:, None]
        sim = set_dof_state(
            m,
            state.sim,
            jnp.where(mm, new_pos, dof_pos(m, state.sim)),
            jnp.where(mm, new_vel, dof_vel(m, state.sim)),
        )
        origins = self._env_origins(ts["terrain_levels"], ts["terrain_types"])
        init_root = jnp.broadcast_to(self.base_init_state, (n, 13))
        init_root = init_root.at[:, 0:3].add(origins)
        init_root = init_root.at[:, 0:2].add(
            jax.random.uniform(k_xy, (n, 2), minval=-0.5, maxval=0.5)
        )
        sim = set_root_state(m, sim, jnp.where(mm, init_root, rs))

        ts["commands"] = jnp.where(mm, self._resample_commands(k_cmd, n), ts["commands"])
        ts["actions"] = jnp.where(mm, 0.0, ts["actions"])
        ts["last_actions"] = jnp.where(mm, 0.0, ts["last_actions"])
        ts["last_dof_vel"] = jnp.where(mm, 0.0, ts["last_dof_vel"])
        ts["feet_air_time"] = jnp.where(mm, 0.0, ts["feet_air_time"])
        ts["init_done"] = jnp.ones((), bool)
        for k in REW_TERMS:
            ts[f"epsum_{k}"] = jnp.where(mask, 0.0, ts[f"epsum_{k}"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    # ------------------------------------------------------------------
    def _make_control(self, state, actions):
        n = actions.shape[0]
        targets = self.action_scale * actions + self.default_dof_pos
        return engine.Control.zero(self.model, n).replace(pos_target=targets)

    def _post_physics(self, state, actions):
        ts = dict(state.ts)
        ts["actions"] = actions
        step = ts["common_step"] + 1
        ts["common_step"] = step

        m = self.model
        rs = root_state(m, state.sim)[:, 0]
        sim = state.sim
        # random pushes every push_interval steps (ref: push_robots :437-439)
        if self.push_enabled:
            key = jax.random.fold_in(state.rng, 1234)
            push_vel = jax.random.uniform(key, (rs.shape[0], 2), minval=-1.0, maxval=1.0)
            do_push = (step % self.push_interval) == 0
            new_rs = rs.at[:, 7:9].set(jnp.where(do_push, push_vel, rs[:, 7:9]))
            sim = set_root_state(m, sim, new_rs)
            sim = engine.forward(m, self.terrain, sim)
            rs = new_rs

        # heading-based yaw command (ref: :462-465)
        base_quat = rs[:, 3:7]
        forward = maths.quat_apply(base_quat, jnp.broadcast_to(jnp.array([1.0, 0, 0]), base_quat.shape[:-1] + (3,)))
        heading = jnp.arctan2(forward[:, 1], forward[:, 0])
        cmds = ts["commands"]
        yaw_cmd = jnp.clip(0.5 * maths.wrap_to_pi(cmds[:, 3] - heading), -1.0, 1.0)
        ts["commands"] = cmds.at[:, 2].set(yaw_cmd)
        return state.replace(sim=sim, ts=ts)

    # ------------------------------------------------------------------
    def _measured_heights(self, state):
        """140-sample height scan around the base (ref: get_heights :515-538)."""
        m = self.model
        rs = root_state(m, state.sim)[:, 0]
        if self.terrain is None:
            return jnp.zeros((rs.shape[0], self.num_height_points)), rs
        base_quat = rs[:, 3:7]
        pts = maths.quat_apply_yaw(
            base_quat[:, None, :], jnp.broadcast_to(
                self.height_points, (rs.shape[0],) + self.height_points.shape
            )
        ) + rs[:, None, 0:3]
        from isaacgymenv_tpu.physics.contact import height_at

        h = height_at(self.terrain, pts[..., 0], pts[..., 1])
        return h, rs

    def _observations(self, state, actions):
        m = self.model
        heights, rs = self._measured_heights(state)
        base_quat = rs[:, 3:7]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, rs[:, 7:10])
        base_ang_vel = maths.quat_rotate_inverse(base_quat, rs[:, 10:13])
        projected_gravity = maths.quat_rotate_inverse(
            base_quat, jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), base_quat.shape[:-1] + (3,))
        )
        height_obs = (
            jnp.clip(rs[:, 2:3] - 0.5 - heights, -1.0, 1.0) * self.height_meas_scale
        )
        cmd_scale = jnp.array([self.lin_vel_scale, self.lin_vel_scale, self.ang_vel_scale])
        return jnp.concatenate(
            [
                base_lin_vel * self.lin_vel_scale,
                base_ang_vel * self.ang_vel_scale,
                projected_gravity,
                state.ts["commands"][:, :3] * cmd_scale,
                dof_pos(m, state.sim) * self.dof_pos_scale,
                dof_vel(m, state.sim) * self.dof_vel_scale,
                height_obs,
                state.ts["actions"],
            ],
            axis=-1,
        )

    def _termination(self, cf, knee_contact):
        """Non-timeout termination (ref: check_termination :300-307)."""
        base_contact = jnp.linalg.norm(cf[:, self.base_index], axis=-1) > 1.0
        done = base_contact
        if not self.allow_knee_contacts:
            done = done | jnp.any(knee_contact, axis=1)
        return done

    def _reward_done(self, state, obs, actions):
        m = self.model
        ts = state.ts
        rs = root_state(m, state.sim)[:, 0]
        base_quat = rs[:, 3:7]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, rs[:, 7:10])
        base_ang_vel = maths.quat_rotate_inverse(base_quat, rs[:, 10:13])
        projected_gravity = maths.quat_rotate_inverse(
            base_quat, jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), base_quat.shape[:-1] + (3,))
        )
        commands = ts["commands"]
        dp = dof_pos(m, state.sim)
        dv = dof_vel(m, state.sim)
        torques = state.sim.dof_force
        cf = state.sim.contact_force
        S = self.rew_scales

        lin_vel_error = jnp.sum(jnp.square(commands[:, :2] - base_lin_vel[:, :2]), axis=1)
        ang_vel_error = jnp.square(commands[:, 2] - base_ang_vel[:, 2])
        r = {}
        r["lin_vel_xy"] = jnp.exp(-lin_vel_error / 0.25) * S["lin_vel_xy"]
        r["ang_vel_z"] = jnp.exp(-ang_vel_error / 0.25) * S["ang_vel_z"]
        r["lin_vel_z"] = jnp.square(base_lin_vel[:, 2]) * S["lin_vel_z"]
        r["ang_vel_xy"] = jnp.sum(jnp.square(base_ang_vel[:, :2]), axis=1) * S["ang_vel_xy"]
        r["orient"] = jnp.sum(jnp.square(projected_gravity[:, :2]), axis=1) * S["orient"]
        r["base_height"] = jnp.square(rs[:, 2] - self.base_height_target) * S["base_height"]
        r["torques"] = jnp.sum(jnp.square(torques), axis=1) * S["torques"]
        r["joint_acc"] = jnp.sum(jnp.square(ts["last_dof_vel"] - dv), axis=1) * S["joint_acc"]

        knee_contact = jnp.linalg.norm(cf[:, self.knee_indices], axis=-1) > 1.0
        r["collision"] = jnp.sum(knee_contact, axis=1).astype(jnp.float32) * S["collision"]

        feet_cf = cf[:, self.feet_indices]
        stumble = (jnp.linalg.norm(feet_cf[..., :2], axis=-1) > 5.0) & (
            jnp.abs(feet_cf[..., 2]) < 1.0
        )
        r["stumble"] = jnp.sum(stumble, axis=1).astype(jnp.float32) * S["stumble"]
        r["action_rate"] = (
            jnp.sum(jnp.square(ts["last_actions"] - ts["actions"]), axis=1)
            * S["action_rate"]
        )

        contact = feet_cf[..., 2] > 1.0
        air = ts["feet_air_time"]
        first_contact = (air > 0.0) & contact
        air = air + self.dt
        rew_air = jnp.sum((air - 0.5) * first_contact, axis=1) * S["air_time"]
        rew_air = rew_air * (jnp.linalg.norm(commands[:, :2], axis=1) > 0.1)
        r["air_time"] = rew_air
        air = air * (~contact)

        r["hip"] = (
            jnp.sum(
                jnp.abs(dp[:, self.hip_dofs] - self.default_dof_pos[self.hip_dofs]),
                axis=1,
            )
            * S["hip"]
        )

        total = sum(r.values())
        total = jnp.clip(total, 0.0, None)

        # termination (ref: check_termination :300-307; subclass hook —
        # the fork's Hound variant uses a different rule)
        done = self._termination(cf, knee_contact)
        timeout = state.progress >= self.max_episode_length - 1
        done = done | timeout
        total = total + S["termination"] * (done & ~timeout)

        # thread task-state mutations (air time, last_*, episode sums)
        ts = dict(ts)
        ts["feet_air_time"] = air
        ts["last_actions"] = ts["actions"]
        ts["last_dof_vel"] = dv
        info = {}
        n_done = jnp.maximum(done.sum(), 1)
        for k in REW_TERMS:
            s = ts[f"epsum_{k}"] + r[k]
            ts[f"epsum_{k}"] = s
            # per-term mean over envs finishing this step, per second of
            # episode (ref: reset_idx extras fill, anymal_terrain.py:420-425)
            info[f"rew_{k}"] = jnp.where(
                done.any(), (s * done).sum() / n_done / self.max_episode_length_s, 0.0
            )
        info["terrain_level"] = ts["terrain_levels"].astype(jnp.float32).mean()
        info["distance_walked"] = ts["last_reset_distance"]
        state = state.replace(ts=ts)
        return state, total, done, {"episode": info}
