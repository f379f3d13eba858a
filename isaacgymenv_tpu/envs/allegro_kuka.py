"""AllegroKuka — DexPBT hand+arm manipulation (reorientation/regrasping/throw).

Behavioral spec (ref: tasks/allegro_kuka/allegro_kuka_base.py + subtask
wrappers + allegro_kuka_utils.py):
- KUKA 7-dof arm + Allegro 16-dof hand (23 dofs, PD position targets:
  Kp 40, Kd 5, kuka effort 300, allegro effort 0.35; :61-71 of
  cfg/task/AllegroKuka.yaml); arm base at (0, 0.8, 0), narrow table at
  dy=-0.8 dz=+0.38, 5 cm cube spawned 0.25 m above the table (:402-410,
  :606-640).
- act (N, 23): relative/absolute PD targets with moving average
  (dofSpeedScale 10).
- obs = "full_state" (:183-226): dof pos/vel, palm pos + rot/vel/angvel,
  object rot/vel/angvel, fingertip positions relative to the object,
  keypoints relative to palm and goal, object scale, episode bookkeeping
  (closest keypoint distance, lifted flag, progress, closest fingertip
  distances, near-goal flag); sizes depend on the subtask's keypoint count.
- reward (:854-930): fingertip-approach deltas (pre-lift), lifting shaped
  reward + one-time lifting bonus, keypoint closest-distance deltas
  (post-lift), action penalties, spread-out reach-goal bonus; success =
  keypoints within tolerance for successSteps; success TOLERANCE CURRICULUM
  (utils: tolerance_curriculum :86-110) tightens 0.075 -> 0.01; PBT
  true_objective interpolates tolerance progress then successes
  (tolerance_successes_objective :128-155).
- resets (:841-849): object below table (z < 0.1), max consecutive
  successes, timeout, + subtask rules (reorientation: fingertips > 1.5 m).
- subtasks: Reorientation (goal pose sampled in a volume above the table,
  8 cube-corner keypoints), Regrasping and Throw (single center keypoint;
  throw target fixed at the bucket position (-0.6, -1, +0.45) rel. arm).
- TwoArms variants: envs/allegro_kuka_two_arms.py.
- Deviations (documented): the bucket/ball/table meshes are simplified to
  box surfaces.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.franka_cube_stack import _add_box_actor
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import engine
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

def cuboid_scale_families(small: bool, big: bool, sticks: bool):
    """Per-env cuboid scale triples — the DexPBT object-dimension DR axis.

    Replicates generate_cuboids.py exactly (ref: tasks/allegro_kuka/
    generate_cuboids.py:92-134): the default cube plus the small/big/stick
    families, volume-filtered, with the thin-plate and non-elongated
    filters, ordered by the reference's generated-filename sort
    (allegro_kuka_base.py:533-541).  Returns a list of (sx, sy, sz) scale
    factors of the base cube size.
    """
    def thin_plate(sc):
        sc = sorted(sc)
        return sc[0] * 3 <= sc[1]

    def non_elongated(sc):
        sc = sorted(sc)
        return sc[2] <= sc[0] * 3 or sc[2] <= sc[1] * 3

    def family(scales, vmin, vmax, filters):
        out = []
        idx = 0
        for xs in scales:
            for ys in scales:
                for zs in scales:
                    vol = xs * ys * zs / (100 * 100 * 100)
                    if vol > vmax or vol < vmin:
                        continue
                    if any(f([xs, ys, zs]) for f in filters):
                        continue
                    out.append(
                        (f"{idx:03d}_cube_{xs}_{ys}_{zs}", (xs / 100.0, ys / 100.0, zs / 100.0))
                    )
                    idx += 1
        return out

    files = family([100], 1.0, 1.0, [])
    if small:
        files += family(
            [100, 50, 66, 75, 90, 110, 125, 150, 175, 200, 250, 300], 1.0, 2.5, []
        )
    if big:
        files += family(
            [100, 125, 150, 200, 250, 300, 350], 2.5, 15.0, [thin_plate]
        )
    if sticks:
        files += family(
            [100, 50, 75, 200, 300, 400, 500, 600], 2.5, 6.0,
            [thin_plate, non_elongated],
        )
    # families share one directory and colliding filenames OVERWRITE
    # (each generate_* call restarts idx at 0 — ref generate_assets:50)
    by_name = {fname: sc for fname, sc in files}
    return [by_name[k] for k in sorted(by_name)]


def batch_object_dims(model, object_body: int, object_scales: np.ndarray,
                      base_size: float):
    """DR-batch the model's geometry leaves for per-env object dimensions.

    The reference spawns a different generated cuboid URDF per env
    (allegro_kuka_base.py:682-683 `i % len(object_assets)`); the TPU-native
    equivalent batches the box surface half-extents, the 8 corner contact
    spheres, and the mass/inertia of the object body to (N, ...) leaves —
    the engine's XLA path gathers them with `[..., idx]` (contact.py) and
    `fused_ok` routes such scenes off the Pallas kernel.
    """
    N = object_scales.shape[0]
    half = (base_size / 2.0) * object_scales  # (N, 3)
    ss = np.asarray(model.surf_size, np.float32)
    ss = np.broadcast_to(ss, (N,) + ss.shape).copy()
    for si, sb in enumerate(model.surf_body):
        if sb == object_body:
            ss[:, si] = half
    gi = [i for i, gb in enumerate(model.geom_body) if gb == object_body]
    gr = np.asarray(model.geom_radius, np.float32)
    gr = np.broadcast_to(gr, (N,) + gr.shape).copy()
    go = np.asarray(model.geom_offset, np.float32)
    go = np.broadcast_to(go, (N,) + go.shape).copy()
    r = np.maximum(half.min(-1) / 2.0, 1e-3)  # (N,) — _add_box_actor's rule
    for i in gi:
        sgn = np.sign(np.asarray(model.geom_offset, np.float32)[i])
        gr[:, i] = r
        go[:, i] = sgn * (half - r[:, None])
    vol = object_scales.prod(-1)  # (N,)
    bm = np.asarray(model.body_mass, np.float32)
    base_mass = float(bm[object_body])
    bm = np.broadcast_to(bm, (N,) + bm.shape).copy()
    bm[:, object_body] = base_mass * vol
    bi = np.asarray(model.body_inertia, np.float32)
    bi = np.broadcast_to(bi, (N,) + bi.shape).copy()
    d = 2.0 * half
    mN = base_mass * vol
    bi[:, object_body] = 0.0
    bi[:, object_body, 0, 0] = mN / 12.0 * (d[:, 1] ** 2 + d[:, 2] ** 2)
    bi[:, object_body, 1, 1] = mN / 12.0 * (d[:, 0] ** 2 + d[:, 2] ** 2)
    bi[:, object_body, 2, 2] = mN / 12.0 * (d[:, 0] ** 2 + d[:, 1] ** 2)
    # effective masses of the object's geoms/surface scale with its mass
    gm = np.asarray(model.geom_meff, np.float32)
    gm = np.broadcast_to(gm, (N,) + gm.shape).copy()
    gm[:, gi] *= vol[:, None]
    repl = dict(
        surf_size=jnp.asarray(ss), geom_radius=jnp.asarray(gr),
        geom_offset=jnp.asarray(go), body_mass=jnp.asarray(bm),
        body_inertia=jnp.asarray(bi), geom_meff=jnp.asarray(gm),
    )
    for name in ("geom_meff_el",):
        leaf = getattr(model, name, None)
        if leaf is not None:
            a = np.asarray(leaf, np.float32)
            a = np.broadcast_to(a, (N,) + a.shape).copy()
            a[:, gi] *= vol[:, None]
            repl[name] = jnp.asarray(a)
    for name in ("surf_meff", "surf_meff_el"):
        leaf = getattr(model, name, None)
        if leaf is not None:
            a = np.asarray(leaf, np.float32)
            a = np.broadcast_to(a, (N,) + a.shape).copy()
            for si, sb in enumerate(model.surf_body):
                if sb == object_body:
                    a[:, si] *= vol
            repl[name] = jnp.asarray(a)
    return model.replace(**repl)


KUKA_DEFAULT = (-1.571, 1.571, 0.0, 1.376, 0.0, 1.485, 2.358)  # ref :284-286
FINGERTIPS = ("index_link_3", "middle_link_3", "ring_link_3", "thumb_link_3")
FINGERTIP_OFFSETS = np.array(
    [[0.05, 0.005, 0], [0.05, 0.005, 0], [0.05, 0.005, 0], [0.06, 0.005, 0]],
    np.float32,
)
PALM_OFFSET = np.array([0.0, -0.02, 0.16], np.float32)  # ref :173
ARM_POS = np.array([0.0, 0.8, 0.0])
TABLE_DY, TABLE_DZ = -0.8, 0.38
OBJ_SIZE = 0.05


class AllegroKukaBase(TaskEnv):
    num_actions = 23

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 600)))
        super().__init__(cfg)
        self.clamp_abs_obs = float(e.get("clampAbsObservations", 10.0))
        self.dof_speed_scale = float(e.get("dofSpeedScale", 10.0))
        self.use_relative_control = bool(e.get("useRelativeControl", False))
        self.act_moving_average = float(e.get("actionsMovingAverage", 1.0))
        self.distance_delta_rew_scale = float(e.get("distanceDeltaRewScale", 50.0))
        self.lifting_rew_scale = float(e.get("liftingRewScale", 20.0))
        self.lifting_bonus = float(e.get("liftingBonus", 300.0))
        self.lifting_bonus_threshold = float(e.get("liftingBonusThreshold", 0.15))
        self.keypoint_rew_scale = float(e.get("keypointRewScale", 200.0))
        self.kuka_pen = float(e.get("kukaActionsPenaltyScale", 0.003))
        self.allegro_pen = float(e.get("allegroActionsPenaltyScale", 0.0003))
        self.reach_goal_bonus = float(e.get("reachGoalBonus", 1000.0))
        self.initial_tolerance = float(e.get("successTolerance", 0.075))
        self.target_tolerance = float(e.get("targetSuccessTolerance", 0.01))
        self.tol_increment = float(e.get("toleranceCurriculumIncrement", 0.9))
        self.tol_interval = int(e.get("toleranceCurriculumInterval", 3000))
        self.success_steps = int(e.get("successSteps", 1))
        self.max_consecutive_successes = int(e.get("maxConsecutiveSuccesses", 50))
        self.keypoint_scale = float(e.get("keypointScale", 1.5))
        self.reset_noise = (
            float(e.get("resetPositionNoiseX", 0.1)),
            float(e.get("resetPositionNoiseY", 0.1)),
            float(e.get("resetPositionNoiseZ", 0.02)),
        )
        self.reset_dof_noise_fingers = float(e.get("resetDofPosRandomIntervalFingers", 0.1))
        self.reset_dof_noise_arm = float(e.get("resetDofPosRandomIntervalArm", 0.1))

        self.keypoint_offsets = np.array(self._object_keypoint_offsets(), np.float32)
        self.num_keypoints = len(self.keypoint_offsets)
        self._build_model(cfg)

        # full_state layout (ref :183-226); fingertip blocks + keypoint info
        self.num_obs = (
            23 + 23 + 3 + 10 + 10 + 12
            + self.num_keypoints * 6 + 3 + 1 + 1 + 2 + 4 + 1
        )
        self.num_states = 0

        # target volume above the table (ref :250-256)
        self.volume_origin = jnp.array([0.0, 0.05, 0.8]) + jnp.array([ARM_POS[0], 0, 0])
        self.volume_extent = jnp.array([[-0.4, 0.4], [-0.05, 0.3], [-0.12, 0.25]])

        self.object_init_pos = jnp.array(
            [ARM_POS[0], ARM_POS[1] + TABLE_DY, ARM_POS[2] + TABLE_DZ + 0.25], jnp.float32
        )

    # ------------------------------------------------------------------
    def _object_keypoint_offsets(self):
        raise NotImplementedError

    def _build_model(self, cfg):
        mb, info = load_urdf(
            os.path.join(
                asset_root(), "urdf/kuka_allegro_description/kuka_allegro_touch_sensor.urdf"
            ),
            AssetOptions(fix_base_link=True, collapse_fixed_joints=False, density=1000.0),
            base_pos=tuple(ARM_POS),
        )
        i = 0
        kuka_effort = [300.0] * 7
        for b in mb.bodies:
            if b.jtype in (1, 2):
                b.drive_mode = DRIVE_POS
                if i < 7:
                    b.stiffness, b.damping, b.effort = 40.0, 5.0, kuka_effort[i]
                else:
                    b.stiffness, b.damping, b.effort = 40.0, 5.0, 0.35
                i += 1
        # narrow table (box approximation of table_narrow.urdf)
        _add_box_actor(
            mb, "table", (0.6, 0.2, 0.19),
            tuple(ARM_POS + np.array([0.0, TABLE_DY, TABLE_DZ / 2])), 50.0, fixed=True,
        )
        m = OBJ_SIZE**3 * 1000.0
        half = OBJ_SIZE / 2
        self.object_body = _add_box_actor(mb, "object", (half,) * 3, None, m)
        mb.gravity = np.array(self.gravity)
        self.model = attach_effective_masses(mb.finalize())
        self._info = info
        lb = info["link_body"]
        self.fingertip_bodies = np.array([lb[f] for f in FINGERTIPS])
        self.palm_body = lb.get("palm_link", lb.get("allegro_mount", 0))
        self.object_actor = self.model.n_actors - 1
        self.dof_lower = jnp.asarray(self.model.dof_lower)
        self.dof_upper = jnp.asarray(self.model.dof_upper)
        self.default_dof = jnp.zeros(23).at[:7].set(jnp.array(KUKA_DEFAULT))
        self._setup_object_scales(cfg)

    def _setup_object_scales(self, cfg):
        """Per-env object dimensions (DexPBT object-dimension DR; ref:
        allegro_kuka_base.py:139 randomizeObjectDimensions, :682 env i gets
        cuboid i % n_assets).  Sets self.object_scales (N, 3), batches the
        model's geometry leaves, and builds per-env keypoint offsets."""
        e = cfg["env"]
        n = self.num_envs
        if bool(e.get("randomizeObjectDimensions", False)):
            fams = cuboid_scale_families(
                small=bool(e.get("withSmallCuboids", True)),
                big=bool(e.get("withBigCuboids", True)),
                sticks=bool(e.get("withSticks", True)),
            )
        else:
            fams = [(1.0, 1.0, 1.0)]
        self.object_scales = np.array(
            [fams[i % len(fams)] for i in range(n)], np.float32
        )
        if len(fams) > 1:
            self.model = batch_object_dims(
                self.model, self.object_body, self.object_scales, OBJ_SIZE
            )
        # (N, K, 3) keypoints scaled per env (ref :706-712)
        self.kp_offsets = jnp.asarray(
            self.keypoint_offsets[None, :, :]
            * self.object_scales[:, None, :] * OBJ_SIZE * self.keypoint_scale / 2.0
        )

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "cur_targets": jnp.zeros((n, 23)),
            "actions": jnp.zeros((n, 23)),
            "goal_pos": jnp.zeros((n, 3)),
            "goal_rot": jnp.zeros((n, 4)).at[:, 3].set(1.0),
            "lifted": jnp.zeros(n, bool),
            "closest_kp_dist": jnp.full((n,), -1.0),
            "closest_ft_dist": jnp.full((n, 4), -1.0),
            "near_goal_steps": jnp.zeros(n, jnp.int32),
            "successes": jnp.zeros(n),
            "prev_ep_successes": jnp.zeros(n),
            "success_tolerance": jnp.asarray(self.initial_tolerance),
            "last_curriculum_update": jnp.zeros((), jnp.int32),
            "frame": jnp.zeros((), jnp.int32),
            "object_init_z": jnp.full((n,), float(self.object_init_pos[2])),
        }

    def _sample_goal(self, key, n):
        """Subtask hook: (pos, rot) target."""
        raise NotImplementedError

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        k_obj, k_rot, k_dof, k_goal = jax.random.split(key, 4)
        mm = mask[:, None]
        ts = dict(state.ts)

        # object: init pos + noise, random yaw
        nx, ny, nz = self.reset_noise
        noise = jax.random.uniform(k_obj, (n, 3), minval=-1.0, maxval=1.0) * jnp.array(
            [nx, ny, nz]
        )
        yaw = jax.random.uniform(k_rot, (n,), minval=-jnp.pi, maxval=jnp.pi)
        zu = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (n, 3))
        quat = maths.quat_from_angle_axis(yaw, zu)
        obj = (
            jnp.zeros((n, 13))
            .at[:, 0:3].set(self.object_init_pos + noise)
            .at[:, 3:7].set(quat)
        )
        rs = root_state(m, state.sim)
        rs = rs.at[:, self.object_actor].set(
            jnp.where(mm, obj, rs[:, self.object_actor])
        )
        sim = set_root_state(m, state.sim, rs)

        # hand-arm dofs: default + noise
        dn = jnp.concatenate(
            [
                jnp.full((7,), self.reset_dof_noise_arm),
                jnp.full((16,), self.reset_dof_noise_fingers),
            ]
        )
        pos = jnp.clip(
            self.default_dof
            + dn * jax.random.uniform(k_dof, (n, 23), minval=-1.0, maxval=1.0),
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
        ts["prev_ep_successes"] = jnp.where(
            mask, ts["successes"], ts["prev_ep_successes"]
        )
        ts["successes"] = jnp.where(mask, 0.0, ts["successes"])
        ts["object_init_z"] = jnp.where(mask, obj[:, 2], ts["object_init_z"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    # ------------------------------------------------------------------
    def _make_control(self, state, actions):
        m = self.model
        n = actions.shape[0]
        ts = dict(state.ts)
        prev = ts["cur_targets"]
        if self.use_relative_control:
            tgt = prev + self.dof_speed_scale * self.dt * actions
        else:
            tgt = maths.scale(actions, self.dof_lower, self.dof_upper)
            tgt = self.act_moving_average * tgt + (1 - self.act_moving_average) * prev
        tgt = jnp.clip(tgt, self.dof_lower, self.dof_upper)
        ts["cur_targets"] = tgt
        ts["actions"] = actions
        ts["frame"] = ts["frame"] + 1
        return (
            engine.Control.zero(m, n).replace(pos_target=tgt),
            state.replace(ts=ts),
        )

    # ------------------------------------------------------------------
    def _scene(self, state):
        m = self.model
        sim = state.sim
        rs = root_state(m, sim)[:, self.object_actor]
        palm_pos = sim.body_pos[:, self.palm_body]
        palm_rot = sim.body_quat[:, self.palm_body]
        palm_center = palm_pos + maths.quat_rotate(
            palm_rot, jnp.broadcast_to(jnp.asarray(PALM_OFFSET), palm_pos.shape)
        )
        ft = self.fingertip_bodies
        ft_pos = sim.body_pos[:, ft]
        ft_rot = sim.body_quat[:, ft]
        off = jnp.broadcast_to(jnp.asarray(FINGERTIP_OFFSETS), ft_pos.shape)
        ft_tip = ft_pos + maths.quat_rotate(ft_rot, off)
        # keypoints ((N, K, 3): per-env offsets under object-dimension DR)
        kp = self.kp_offsets
        obj_rot_rep = jnp.broadcast_to(
            rs[:, None, 3:7], rs.shape[:-1] + (self.num_keypoints, 4)
        )
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
            [palm_rot, sim.body_linvel[:, self.palm_body], sim.body_angvel[:, self.palm_body]], -1
        )
        ft_rel = (ft_tip - rs[:, None, 0:3]).reshape(n, 12)
        kp_rel_palm = (obj_kp - palm_center[:, None]).reshape(n, -1)
        kp_rel_goal = (obj_kp - goal_kp).reshape(n, -1)
        kp_max_dist = jnp.linalg.norm(obj_kp - goal_kp, axis=-1).max(-1)
        closest_kp = jnp.where(
            ts["closest_kp_dist"] < 0, kp_max_dist, ts["closest_kp_dist"]
        )
        ft_dist = jnp.linalg.norm(ft_tip - rs[:, None, 0:3], axis=-1)
        closest_ft = jnp.where(ts["closest_ft_dist"] < 0, ft_dist, ts["closest_ft_dist"])
        near_goal = (
            kp_max_dist <= ts["success_tolerance"] * self.keypoint_scale
        )
        obs = jnp.concatenate(
            [
                dp, dv,
                palm_center, palm_state,
                jnp.concatenate([rs[:, 3:7], rs[:, 7:10], rs[:, 10:13]], -1),
                ft_rel,
                kp_rel_palm, kp_rel_goal,
                jnp.asarray(self.object_scales),  # per-env cuboid scales (ref :213)
                closest_kp[:, None],
                ts["lifted"][:, None].astype(jnp.float32),
                jnp.stack(
                    [
                        state.progress.astype(jnp.float32) / self.max_episode_length,
                        ts["successes"],
                    ],
                    -1,
                ),
                closest_ft,
                near_goal[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )
        return jnp.clip(obs, -self.clamp_abs_obs, self.clamp_abs_obs)

    # ------------------------------------------------------------------
    def _extra_reset_rules(self, state, resets, ft_dist):
        return resets

    def _reward_done(self, state, obs, actions):
        """ref: compute_kuka_reward (allegro_kuka_base.py:854-930)."""
        m = self.model
        ts = dict(state.ts)
        rs, palm_center, _, _, ft_tip, obj_kp, goal_kp = self._scene(state)
        dv = dof_vel(m, state.sim)

        # lifting (ref _lifting_reward :789-812)
        z_lift = 0.05 + rs[:, 2] - ts["object_init_z"]
        lifting_rew = jnp.clip(z_lift, 0.0, 0.5)
        lifted = (z_lift > self.lifting_bonus_threshold) | ts["lifted"]
        just_lifted = lifted & ~ts["lifted"]
        lift_bonus = self.lifting_bonus * just_lifted
        lifting_rew = lifting_rew * ~lifted

        # fingertip deltas (ref _distance_delta_rewards :759-787)
        ft_dist = jnp.linalg.norm(ft_tip - rs[:, None, 0:3], axis=-1)
        closest_ft = jnp.where(ts["closest_ft_dist"] < 0, ft_dist, ts["closest_ft_dist"])
        ft_deltas = jnp.clip(closest_ft - ft_dist, 0.0, 10.0)
        ts["closest_ft_dist"] = jnp.minimum(closest_ft, ft_dist)
        ft_delta_rew = ft_deltas.sum(-1) * ~lifted

        # keypoint deltas (ref _keypoint_reward :814-828)
        kp_max_dist = jnp.linalg.norm(obj_kp - goal_kp, axis=-1).max(-1)
        closest_kp = jnp.where(
            ts["closest_kp_dist"] < 0, kp_max_dist, ts["closest_kp_dist"]
        )
        kp_deltas = jnp.clip(closest_kp - kp_max_dist, 0.0, 100.0)
        ts["closest_kp_dist"] = jnp.minimum(closest_kp, kp_max_dist)
        keypoint_rew = kp_deltas * lifted

        # success accounting
        near_goal = kp_max_dist <= ts["success_tolerance"] * self.keypoint_scale
        near_goal_steps = ts["near_goal_steps"] + near_goal
        is_success = near_goal_steps >= self.success_steps
        ts["near_goal_steps"] = jnp.where(is_success, 0, near_goal_steps)
        ts["successes"] = ts["successes"] + is_success
        ts["lifted"] = lifted

        kuka_pen = -jnp.sum(jnp.abs(dv[:, :7]), -1) * self.kuka_pen
        allegro_pen = -jnp.sum(jnp.abs(dv[:, 7:23]), -1) * self.allegro_pen
        bonus = near_goal * (self.reach_goal_bonus / self.success_steps)

        reward = (
            ft_delta_rew * self.distance_delta_rew_scale
            + lifting_rew * self.lifting_rew_scale
            + lift_bonus
            + keypoint_rew * self.keypoint_rew_scale
            + kuka_pen
            + allegro_pen
            + bonus
        )

        resets = rs[:, 2] < 0.1  # object fell below the table (ref :842)
        progress = state.progress
        if self.max_consecutive_successes > 0:
            progress = jnp.where(is_success, 0, progress)
            resets = resets | (ts["successes"] >= self.max_consecutive_successes)
        resets = resets | (progress >= self.max_episode_length - 1)
        resets = self._extra_reset_rules(state, resets, ft_dist)

        # success-tolerance curriculum (ref _extra_curriculum + utils :86-110)
        due = (ts["frame"] - ts["last_curriculum_update"]) >= self.tol_interval
        good = ts["prev_ep_successes"].mean() >= 3.0
        new_tol = jnp.maximum(
            ts["success_tolerance"] * self.tol_increment, self.target_tolerance
        )
        ts["success_tolerance"] = jnp.where(due & good, new_tol, ts["success_tolerance"])
        ts["last_curriculum_update"] = jnp.where(
            due & good, ts["frame"], ts["last_curriculum_update"]
        )

        # PBT true objective (utils: tolerance_successes_objective :128-155)
        tol_obj = (self.initial_tolerance - ts["success_tolerance"]) / max(
            self.initial_tolerance - self.target_tolerance, 1e-9
        )
        at_target = ts["success_tolerance"] <= self.target_tolerance
        true_objective = jnp.where(
            at_target, 1.0 + ts["successes"], tol_obj + 0.01 * ts["successes"]
        )

        # resample goal on success without resetting the env
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


@register("AllegroKukaReorientation")
class AllegroKukaReorientation(AllegroKukaBase):
    """Goal pose sampled in a volume above the table, full orientation."""

    def _object_keypoint_offsets(self):
        return [
            [1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1],
            [-1, 1, 1], [-1, 1, -1], [-1, -1, 1], [-1, -1, -1],
        ]

    def _sample_goal(self, key, n):
        k1, k2 = jax.random.split(key)
        lo = self.volume_origin + self.volume_extent[:, 0]
        hi = self.volume_origin + self.volume_extent[:, 1]
        pos = lo + jax.random.uniform(k1, (n, 3)) * (hi - lo)
        rot = maths.quat_unit(jax.random.normal(k2, (n, 4)))
        return pos, rot

    def _extra_reset_rules(self, state, resets, ft_dist):
        # hand far from the object (ref reorientation :103-108)
        return resets | (ft_dist.max(-1) > 1.5)


@register("AllegroKukaRegrasping")
class AllegroKukaRegrasping(AllegroKukaBase):
    """Position-only target in the volume (single center keypoint)."""

    def _object_keypoint_offsets(self):
        return [[0, 0, 0]]

    def _sample_goal(self, key, n):
        lo = self.volume_origin + self.volume_extent[:, 0]
        hi = self.volume_origin + self.volume_extent[:, 1]
        pos = lo + jax.random.uniform(key, (n, 3)) * (hi - lo)
        return pos, jnp.zeros((n, 4)).at[:, 3].set(1.0)


@register("AllegroKukaThrow")
class AllegroKukaThrow(AllegroKukaBase):
    """Throw the cube into a bucket at a fixed offset from the arm."""

    def _object_keypoint_offsets(self):
        return [[0, 0, 0]]

    def _sample_goal(self, key, n):
        # bucket position (ref throw :68-72)
        pos = jnp.broadcast_to(
            jnp.array(
                [ARM_POS[0] - 0.6, ARM_POS[1] - 1.0, ARM_POS[2] + 0.45], jnp.float32
            ),
            (n, 3),
        )
        return pos, jnp.zeros((n, 4)).at[:, 3].set(1.0)
