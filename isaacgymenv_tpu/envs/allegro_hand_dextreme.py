"""AllegroHandDextreme — sim-to-real in-hand reorientation (DeXtreme).

Behavioral spec (ref: tasks/dextreme/allegro_hand_dextreme.py +
tasks/dextreme/adr_vec_task.py):
- AllegroHand reorientation plus the DeXtreme sim-to-real machinery:
  - action latency queue (0..15 control steps, annealed over
    actionLatencyScheduledSteps) + per-env action-drop probability
    (apply_action_noise_latency, :1577-1608);
  - simulated vision pipeline for the cube pose: per-env refresh
    rate/offset + update-delay probability (:606-646);
  - RandomNetworkAdversary action mixing with per-env alpha (:429, rna_util);
  - reward adds action-delta and joint-velocity penalties and requires the
    goal to be HELD for num_success_hold_steps before it counts
    (compute_hand_reward :1614-1665).
- AllegroHandDextremeADR: ranges of the noise parameters (affine scalings,
  latencies, delay probabilities, rna alpha) are governed by the tensorized
  ADR engine (utils/adr.py); the ADR objective is the per-episode
  consecutive-success count.
- Dict observations: the flat `obs` concatenates the dict entries in the
  documented fixed order, AND the per-key dict surface (incl. the
  `*_randomized` duplicates) is exposed via `obs_dict["obs_dict"]` for the
  ComplexObsRLGPUEnv-style key-selecting networks (see _obs_named below).
- Deviations (documented):
  - ADR "range_path" builtin params (hand dof damping/stiffness/friction/
    armature/effort scales) are wired as per-env multiplicative scales on
    the corresponding SimModel leaves.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.allegro_hand import AllegroHand
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.types import dof_pos, dof_vel, root_state
from isaacgymenv_tpu.utils.adr import ADR
from isaacgymenv_tpu.utils.rna import RandomNetworkAdversary

# flat obs layout (ManualDR), fixed key order (ref get_num_obs_dict :1515)
MANUAL_KEYS = [
    ("dof_pos", 16), ("dof_vel", 16), ("dof_force", 16),
    ("object_pose", 7), ("object_vels", 6),
    ("goal_pose", 7), ("goal_relative_rot", 4),
    ("object_pose_cam", 7), ("goal_relative_rot_cam", 4),
    ("last_actions", 16),
    ("cube_random_params", 3), ("hand_random_params", 1), ("gravity_vec", 3),
    ("rot_dist", 2), ("ft_states", 52), ("ft_force_torques", 24),
]
# ADR variant key order (ref get_num_obs_dict :168)
ADR_KEYS = [
    ("dof_pos", 16), ("dof_pos_randomized", 16), ("dof_vel", 16),
    ("dof_force", 16), ("object_vels", 6), ("last_actions", 16),
    ("cube_random_params", 3), ("hand_random_params", 1), ("gravity_vec", 3),
    ("ft_states", 52), ("ft_force_torques", 24), ("rb_forces", 3),
    ("rot_dist", 2), ("stochastic_delay_params", 4), ("affine_params", 78),
    ("object_pose", 7), ("goal_pose", 7), ("goal_relative_rot", 4),
    ("object_pose_cam_randomized", 7), ("goal_relative_rot_cam_randomized", 4),
]

# Asymmetric actor/critic key selections — EXACTLY the reference train-config
# `network.inputs` / `central_value_config.network.inputs` lists
# (ref: cfg/train/AllegroHandDextremeManualDRPPO.yaml:24-30,102-117 and
# cfg/train/AllegroHandDextremeADRPPO.yaml:24-29,102-127).  The policy sees
# only the noisy/delayed 50-dim subset; the central-value critic sees the
# privileged simulation state.
MANUAL_ACTOR_KEYS = [
    ("dof_pos_randomized", 16), ("object_pose_cam_randomized", 7),
    ("goal_pose_randomized", 7), ("goal_relative_rot_cam_randomized", 4),
    ("last_actions_randomized", 16),
]
MANUAL_CRITIC_KEYS = [
    ("dof_pos", 16), ("dof_vel", 16), ("dof_force", 16),
    ("object_pose", 7), ("object_pose_cam_randomized", 7), ("object_vels", 6),
    ("goal_pose", 7), ("goal_relative_rot", 4), ("last_actions", 16),
    ("ft_force_torques", 24), ("gravity_vec", 3), ("ft_states", 52),
]
ADR_ACTOR_KEYS = [
    ("dof_pos_randomized", 16), ("object_pose_cam_randomized", 7),
    ("goal_pose", 7), ("goal_relative_rot_cam_randomized", 4),
    ("last_actions", 16),
]
ADR_CRITIC_KEYS = [
    ("dof_pos", 16), ("dof_vel", 16), ("dof_force", 16),
    ("object_pose", 7), ("object_pose_cam_randomized", 7), ("object_vels", 6),
    ("goal_pose", 7), ("goal_relative_rot", 4), ("last_actions", 16),
    ("stochastic_delay_params", 4), ("affine_params", 78),
    ("cube_random_params", 3), ("hand_random_params", 1),
    ("ft_force_torques", 24), ("gravity_vec", 3), ("ft_states", 52),
    ("rot_dist", 2), ("rb_forces", 3),
]


@register("AllegroHandDextremeManualDR")
class AllegroHandDextremeManualDR(AllegroHand):
    num_actions = 16
    OBS_KEYS = MANUAL_KEYS  # full dict layout (ref get_num_obs_dict :1515)
    ACTOR_KEYS = MANUAL_ACTOR_KEYS
    CRITIC_KEYS = MANUAL_CRITIC_KEYS

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("observationType", "full_state")
        # resetTime overrides episodeLength (ref :76-80); 8 s @ 30 Hz ctrl
        reset_time = float(e.get("resetTime", -1))
        cfi = int(e.get("controlFrequencyInv", 2))
        e.setdefault("controlFrequencyInv", cfi)
        if reset_time > 0:
            e["episodeLength"] = int(round(reset_time / (cfi * 1 / 60.0)))
        super().__init__(cfg)
        # dict-obs runtime: policy obs = ACTOR_KEYS concat (50-dim), critic
        # states = CRITIC_KEYS concat — the ComplexObsRLGPUEnv contract with
        # concat=True (ref: utils/rlgames_utils.py:298-423, train.py:156-170)
        self.num_obs = sum(d for _, d in self.ACTOR_KEYS)
        self.num_states = sum(d for _, d in self.CRITIC_KEYS)
        # per-key white/correlated obs noise (ref task yaml
        # task.randomization_params.observations; white is gated at 50%
        # probability — the reference's hidden `apply_white_noise_prob`)
        obs_rand = (
            cfg.get("task", {}).get("randomization_params", {}).get("observations", {})
        )

        def _noise(key_, default_white=0.005, default_corr=0.01):
            spec = obs_rand.get(key_, {})
            return (
                float(spec.get("range", [0, default_white])[1]),
                float(spec.get("range_correlated", [0, default_corr])[1]),
            )

        self.obs_noise_spec = {
            k: _noise(k)
            for k in ("dof_pos", "object_pose_cam", "goal_pose",
                      "goal_relative_rot_cam", "last_actions")
        }

        self.action_delta_penalty = float(e.get("actionDeltaPenaltyScale", -0.01))
        self.hold_steps = int(e.get("numSuccessHoldSteps", 1))
        self.max_skip_obs = int(e.get("maxObjectSkipObs", 2))
        self.action_latency_max = int(e.get("actionLatencyMax", 15))
        self.action_latency_sched = int(e.get("actionLatencyScheduledSteps", 10_000_000))
        self.action_delay_prob_max = float(e.get("actionDelayProbMax", 0.3))
        self.rna_enabled = bool(cfg.get("task", {}).get("randomize", False))
        self.rna = RandomNetworkAdversary(
            jax.random.PRNGKey(int(cfg.get("seed", 0)) + 123),
            self.num_envs, in_dims=16 + 7, out_dims=16,
        )
        self._setup_scale_dr(cfg)

    # ------------------------------------------------------------------
    def _setup_scale_dr(self, cfg):
        """Setup-only actor scale DR + the real random-param obs channel.

        The reference randomizes hand and object SCALE once per env at
        startup (task yaml actor_params.{hand,object}.scale,
        setup_only: True, uniform [0.95, 1.05]) and feeds the drawn values
        into the policy obs via cube_random_params / hand_random_params
        (ref: tasks/dextreme/allegro_hand_dextreme.py:180, 1337-1341
        randomisation_callback).  TPU-native: per-env geometry leaves are
        DR-batched (joint_pos/geom/surf), the scales are kept for the obs.
        Masses stay with the separate mass-DR axis (Isaac's set_actor_scale
        rescales collision shapes; mass has its own randomization entry).
        """
        task_cfg = cfg.get("task", {})
        ap = task_cfg.get("randomization_params", {}).get("actor_params", {})
        rng = np.random.default_rng(int(cfg.get("seed", 0)) + 41)
        n = self.num_envs

        def sample(actor):
            spec = (ap.get(actor) or {}).get("scale")
            if not spec or not bool(task_cfg.get("randomize", False)):
                return np.ones(n, np.float32)
            lo, hi = spec.get("range", [1.0, 1.0])
            return rng.uniform(lo, hi, n).astype(np.float32)

        self.hand_scale_dr = sample("hand")
        self.object_scale_dr = sample("object")
        if np.allclose(self.hand_scale_dr, 1.0) and np.allclose(
            self.object_scale_dr, 1.0
        ):
            return
        m = self.model
        # bodies are contiguous per actor (ModelBuilder.merge)
        roots = list(m.actor_root) + [m.nb]
        hand_bodies = set(range(roots[0], roots[1]))
        obj_bodies = set(range(roots[1], roots[2] if len(roots) > 2 else m.nb))
        s_of_body = np.ones((n, m.nb), np.float32)
        for b in hand_bodies:
            s_of_body[:, b] = self.hand_scale_dr
        for b in obj_bodies:
            s_of_body[:, b] = self.object_scale_dr

        jp = np.asarray(m.joint_pos, np.float32)
        jp = np.broadcast_to(jp, (n,) + jp.shape).copy()
        for b in range(m.nb):
            # scale link offsets about the actor origin; the root's own
            # placement (world mount / free-joint q) is NOT scaled
            if m.parent[b] >= 0:
                jp[:, b] *= s_of_body[:, b, None]
        go = np.asarray(m.geom_offset, np.float32)
        go = np.broadcast_to(go, (n,) + go.shape).copy()
        gr = np.asarray(m.geom_radius, np.float32)
        gr = np.broadcast_to(gr, (n,) + gr.shape).copy()
        for g, gb in enumerate(m.geom_body):
            go[:, g] *= s_of_body[:, gb, None]
            gr[:, g] *= s_of_body[:, gb]
        repl = dict(
            joint_pos=jnp.asarray(jp), geom_offset=jnp.asarray(go),
            geom_radius=jnp.asarray(gr),
        )
        if m.n_pairs:
            so = np.asarray(m.surf_offset, np.float32)
            so = np.broadcast_to(so, (n,) + so.shape).copy()
            ss = np.asarray(m.surf_size, np.float32)
            ss = np.broadcast_to(ss, (n,) + ss.shape).copy()
            for s_, sb in enumerate(m.surf_body):
                so[:, s_] *= s_of_body[:, sb, None]
                ss[:, s_] *= s_of_body[:, sb, None]
            repl.update(surf_offset=jnp.asarray(so), surf_size=jnp.asarray(ss))
        self.model = m.replace(**repl)

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        ts = super()._initial_ts(key)
        n = self.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        ts.update(
            {
                "action_queue": jnp.zeros((n, self.action_latency_max + 1, 16)),
                "prev_actions": jnp.zeros((n, 16)),
                "action_latency": jnp.zeros(n, jnp.int32),
                "action_delay_prob": self.action_delay_prob_max
                * jax.random.uniform(k1, (n,)),
                "pose_refresh_rate": jax.random.randint(k2, (n,), 1, self.max_skip_obs + 1),
                "pose_refresh_offset": jax.random.randint(k3, (n,), 0, self.max_skip_obs),
                "obs_object_pose_freq": jnp.zeros((n, 7)).at[:, 6].set(1.0),
                "obs_object_pose": jnp.zeros((n, 7)).at[:, 6].set(1.0),
                "hold_count": jnp.zeros(n, jnp.int32),
                "best_rot_dist": jnp.full((n,), -1.0),
                "frame": jnp.zeros((), jnp.int32),
            }
        )
        for i, k_ in enumerate(self.obs_noise_spec):
            ts[f"corr_noise_{k_}"] = jax.random.normal(
                jax.random.fold_in(key, 70 + i), (n, 16)
            )
        return ts

    # ------------------------------------------------------------------
    def _latency_actions(self, state, actions):
        """Queue + latency + drop-probability pipeline (ref :1577-1608)."""
        ts = dict(state.ts)
        n = actions.shape[0]
        queue = jnp.concatenate(
            [actions[:, None], ts["action_queue"][:, :-1]], axis=1
        )
        ts["action_queue"] = queue
        # annealed latency cap (ref: cur_action_latency)
        frac = jnp.minimum(ts["frame"].astype(jnp.float32) / self.action_latency_sched, 1.0)
        cur_max = jnp.maximum(
            (frac * self.action_latency_max).astype(jnp.int32), 1
        )
        k1, k2 = jax.random.split(jax.random.fold_in(state.rng, 55))
        latency = jax.random.randint(k1, (n,), 0, self.action_latency_max + 1)
        latency = jnp.minimum(latency, cur_max)
        ts["action_latency"] = latency
        delayed = jnp.take_along_axis(
            queue, latency[:, None, None].repeat(16, axis=-1), axis=1
        )[:, 0]
        drop = jax.random.uniform(k2, (n,)) < ts["action_delay_prob"]
        acts = jnp.where(drop[:, None], ts["prev_actions"], delayed)
        ts["prev_actions"] = acts
        return state.replace(ts=ts), acts

    def _rna_alpha(self, state):
        if not self.rna_enabled:
            return jnp.zeros((self.num_envs, 1))
        return jax.random.uniform(
            jax.random.fold_in(state.rng, 56), (self.num_envs, 1)
        )

    def _make_control(self, state, actions):
        state, acts = self._latency_actions(state, actions)
        if self.rna_enabled:
            obj_pose = root_state(self.model, state.sim)[:, self.object_actor, 0:7]
            rna_in = jnp.concatenate(
                [dof_pos(self.model, state.sim), obj_pose], axis=-1
            )
            alpha = self._rna_alpha(state)
            acts = alpha * self.rna(rna_in) + (1.0 - alpha) * acts
        out = super()._make_control(state, acts)
        if isinstance(out, tuple):
            ctrl, state = out
        else:
            ctrl = out
        ts = dict(state.ts)
        ts["frame"] = ts["frame"] + 1
        return ctrl, state.replace(ts=ts)

    # ------------------------------------------------------------------
    def _post_physics(self, state, actions):
        """Simulated vision pipeline + best-rotation tracking, threaded
        through the env state BEFORE obs are computed (ref :606-646)."""
        state = super()._post_physics(state, actions)
        ts = dict(state.ts)
        obj_pos, obj_rot, _, _ = self._object_state(state)
        obj_pose = jnp.concatenate([obj_pos, obj_rot], -1)
        update_freq = (
            jnp.remainder(ts["frame"] + ts["pose_refresh_offset"], ts["pose_refresh_rate"]) == 0
        )
        freq_pose = jnp.where(update_freq[:, None], obj_pose, ts["obs_object_pose_freq"])
        ts["obs_object_pose_freq"] = freq_pose
        # reference uses randn > prob: replicate the (quirky) gaussian gate
        g = jax.random.normal(jax.random.fold_in(state.rng, 57), (obj_pose.shape[0],))
        update = g > 0.3
        cam_pose = jnp.where(update[:, None], freq_pose, ts["obs_object_pose"])
        ts["obs_object_pose"] = cam_pose
        quat_diff = maths.quat_mul(obj_rot, maths.quat_conjugate(ts["goal_rot"]))
        rot_dist = 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(quat_diff[:, 0:3], axis=-1), 0.0, 1.0)
        )
        ts["best_rot_dist"] = jnp.where(
            ts["best_rot_dist"] < 0.0, rot_dist,
            jnp.minimum(ts["best_rot_dist"], rot_dist),
        )
        return state.replace(ts=ts)

    def _obs_pieces(self, state):
        m = self.model
        ts = state.ts
        obj_pos, obj_rot, obj_linvel, obj_angvel = self._object_state(state)
        obj_pose = jnp.concatenate([obj_pos, obj_rot], -1)
        goal_rot = ts["goal_rot"]
        goal_pose = jnp.concatenate(
            [jnp.broadcast_to(self.goal_pos, obj_pos.shape), goal_rot], -1
        )
        dp = maths.unscale(dof_pos(m, state.sim), self.dof_lower, self.dof_upper)
        dv = dof_vel(m, state.sim)
        quat_diff = maths.quat_mul(obj_rot, maths.quat_conjugate(goal_rot))
        rot_dist = 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(quat_diff[:, 0:3], axis=-1), 0.0, 1.0)
        )
        ft = np.array(
            [i for i, n_ in enumerate(m.body_names) if "biotac_tip" in n_ or "tip" in n_]
        )[:4]
        sim = state.sim
        ft_states = jnp.concatenate(
            [sim.body_pos[:, ft], sim.body_quat[:, ft], sim.body_linvel[:, ft], sim.body_angvel[:, ft]],
            axis=-1,
        ).reshape(obj_pos.shape[0], -1)
        ft_wrench = jnp.concatenate(
            [sim.contact_force[:, ft], sim.contact_torque[:, ft]], -1
        ).reshape(obj_pos.shape[0], -1)
        return dict(
            dp=dp, dv=dv, dof_force=sim.dof_force, obj_pose=obj_pose,
            obj_vels=jnp.concatenate([obj_linvel, self.vel_obs_scale * obj_angvel], -1),
            goal_pose=goal_pose,
            goal_rel_rot=quat_diff, rot_dist=rot_dist,
            ft_states=ft_states, ft_wrench=ft_wrench,
        )

    def _randomize_key(self, state, key_name, value, fold):
        """White (50%-gated) + per-episode correlated gaussian noise on one
        obs key (ref: adr_vec_task.py:143-151 `*_randomized` duplicates +
        the task yaml noise spec; correlated noise is refreshed per episode
        here vs per DR-frequency window in the reference — documented)."""
        white_s, corr_s = self.obs_noise_spec[key_name]
        k = jax.random.fold_in(state.rng, fold)
        k_w, k_gate = jax.random.split(k)
        white = white_s * jax.random.normal(k_w, value.shape)
        gate = jax.random.uniform(k_gate, value.shape[:1]) < 0.5
        corr = state.ts[f"corr_noise_{key_name}"][..., : value.shape[-1]]
        return value + jnp.where(gate[:, None], white, 0.0) + corr_s * corr

    def _cube_random_params(self, state, n):
        """[object scale, object mass, object friction] per env — the real
        values behind the reference's randomisation_callback channel
        (ref: allegro_hand_dextreme.py:1337-1341).  Scale is the setup-only
        draw; mass/friction read the LIVE per-env DR state when the DR
        engine randomizes them, else the static model values."""
        import jax.numpy as jnp

        dr = state.ts.get("dr_params", {}) if isinstance(state.ts, dict) else {}
        bm = dr.get("body_mass")
        mass = (
            bm[:, self.object_body]
            if bm is not None
            else jnp.full((n,), self.object_mass)  # static fallback (host float)
        )
        gf = dr.get("geom_friction")
        obj_geoms = np.array(
            [g for g, gb in enumerate(self.model.geom_body)
             if gb == self.object_body], np.int32,
        )
        if gf is not None and obj_geoms.size:
            fric = gf[:, obj_geoms].mean(-1)
        else:
            gfs = np.asarray(self.model.geom_friction, np.float32).reshape(-1)
            f0 = gfs[obj_geoms].mean() if obj_geoms.size else gfs.mean()
            fric = jnp.full((n,), float(f0))
        return jnp.stack([jnp.asarray(self.object_scale_dr), mass, fric], -1)

    def _obs_dict(self, state, actions):
        p = self._obs_pieces(state)
        ts = state.ts
        n = p["dp"].shape[0]
        cam_pose = ts["obs_object_pose"]  # updated in _post_physics
        best = ts["best_rot_dist"]
        cam_rel_rot = maths.quat_mul(
            cam_pose[:, 3:7], maths.quat_conjugate(ts["goal_rot"])
        )
        zeros = lambda d: jnp.zeros((n, d))
        pieces = {
            "dof_pos": p["dp"], "dof_vel": p["dv"], "dof_force": p["dof_force"],
            "object_pose": p["obj_pose"], "object_vels": p["obj_vels"],
            "goal_pose": p["goal_pose"], "goal_relative_rot": p["goal_rel_rot"],
            "object_pose_cam": cam_pose, "goal_relative_rot_cam": cam_rel_rot,
            "last_actions": ts["actions"],
            "cube_random_params": self._cube_random_params(state, n),
            "hand_random_params": jnp.asarray(self.hand_scale_dr)[:, None],
            "gravity_vec": jnp.broadcast_to(jnp.asarray(self.model.gravity), (n, 3)),
            "rot_dist": jnp.stack([p["rot_dist"], best], -1),
            "ft_states": p["ft_states"], "ft_force_torques": p["ft_wrench"],
        }
        pieces["dof_pos_randomized"] = self._randomize_key(
            state, "dof_pos", pieces["dof_pos"], 61
        )
        pieces["object_pose_cam_randomized"] = self._randomize_key(
            state, "object_pose_cam", cam_pose, 62
        )
        pieces["goal_pose_randomized"] = self._randomize_key(
            state, "goal_pose", pieces["goal_pose"], 63
        )
        pieces["goal_relative_rot_cam_randomized"] = self._randomize_key(
            state, "goal_relative_rot_cam", cam_rel_rot, 64
        )
        pieces["last_actions_randomized"] = self._randomize_key(
            state, "last_actions", pieces["last_actions"], 65
        )
        return pieces

    @property
    def obs_dims(self):
        """Per-key observation dims, fixed reference order
        (ref: get_num_obs_dict; adr_vec_task.py obs_dims -> buffers)."""
        return dict(self.OBS_KEYS)

    def _obs_named(self, state, actions):
        """The dict-obs surface: every OBS_KEYS entry incl. the
        `*_randomized` noised duplicates (ref: adr_vec_task.py:143-220)."""
        pieces = self._obs_dict(state, actions)
        return {k: pieces[k] for k, _ in self.OBS_KEYS if k in pieces}

    def _observations(self, state, actions):
        pieces = self._obs_dict(state, actions)
        return jnp.concatenate([pieces[k] for k, _ in self.ACTOR_KEYS], axis=-1)

    def _states(self, state, obs):
        # privileged central-value input (XLA CSE dedupes the shared pieces
        # recomputed across _observations/_states within one step jit)
        pieces = self._obs_dict(state, jnp.zeros((self.num_envs, 16)))
        return jnp.concatenate([pieces[k] for k, _ in self.CRITIC_KEYS], axis=-1)

    def _reward_done(self, state, obs, actions):
        """Dextreme reward (ref compute_hand_reward :1614-1665): hold-to-score
        goals, action-delta and joint-velocity penalties."""
        ts = dict(state.ts)
        obj_pos, obj_rot, _, _ = self._object_state(state)
        goal_dist = jnp.linalg.norm(obj_pos - self.goal_pos, axis=-1)
        quat_diff = maths.quat_mul(obj_rot, maths.quat_conjugate(ts["goal_rot"]))
        rot_dist = 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(quat_diff[:, 0:3], axis=-1), 0.0, 1.0)
        )
        dv = dof_vel(self.model, state.sim)

        dist_rew = goal_dist * self.dist_reward_scale
        rot_rew = 1.0 / (jnp.abs(rot_dist) + self.rot_eps) * self.rot_reward_scale
        action_pen = self.action_penalty_scale * jnp.sum(actions**2, -1)
        delta_pen = self.action_delta_penalty * jnp.sum(
            (actions - ts["prev_actions"]) ** 2, -1
        )
        max_vel, vel_tol = 5.0, 1.0
        vel_pen = -0.05 * jnp.sum((dv / (max_vel - vel_tol)) ** 2, -1)

        goal_reached = jnp.abs(rot_dist) <= self.success_tolerance
        hold = jnp.where(goal_reached, ts["hold_count"] + 1, 0)
        goal_resets = hold > self.hold_steps
        successes = ts["successes"] + goal_resets
        reach_rew = goal_resets * self.reach_goal_bonus
        fall_rew = (goal_dist >= self.fall_dist) * self.fall_penalty

        resets = goal_dist >= self.fall_dist
        progress = state.progress
        if self.max_consecutive_successes > 0:
            progress = jnp.where(goal_reached, 0, progress)
            resets = resets | (successes >= self.max_consecutive_successes)
        timeout = progress >= self.max_episode_length - 1
        resets = resets | timeout
        timeout_rew = timeout * 0.5 * self.fall_penalty

        reward = dist_rew + rot_rew + action_pen + delta_pen + vel_pen + reach_rew + fall_rew + timeout_rew

        num_resets = resets.sum()
        finished = (successes * resets).sum()
        cons = jnp.where(
            num_resets > 0,
            self.av_factor * finished / jnp.maximum(num_resets, 1)
            + (1.0 - self.av_factor) * ts["consecutive_successes"],
            ts["consecutive_successes"],
        )
        ts["hold_count"] = jnp.where(goal_resets, 0, hold)
        ts["successes"] = successes
        ts["consecutive_successes"] = cons
        ts["reset_goal"] = goal_resets
        state = state.replace(ts=ts, progress=progress)
        info = {"consecutive_successes": cons, "successes": successes.mean()}
        return state, reward, resets, info

    def _reset_envs(self, state, mask, key):
        state = super()._reset_envs(state, mask, key)
        ts = dict(state.ts)
        ts["hold_count"] = jnp.where(mask, 0, ts["hold_count"])
        ts["best_rot_dist"] = jnp.where(mask, -1.0, ts["best_rot_dist"])
        mm = mask[:, None]
        ts["prev_actions"] = jnp.where(mm, 0.0, ts["prev_actions"])
        ts["action_queue"] = jnp.where(mask[:, None, None], 0.0, ts["action_queue"])
        # refresh per-episode correlated obs noise (ref range_correlated)
        for i, k_ in enumerate(self.obs_noise_spec):
            fresh = jax.random.normal(
                jax.random.fold_in(key, 80 + i), (mask.shape[0], 16)
            )
            ts[f"corr_noise_{k_}"] = jnp.where(mm, fresh, ts[f"corr_noise_{k_}"])
        return state.replace(ts=ts)


@register("AllegroHandDextremeADR")
class AllegroHandDextremeADR(AllegroHandDextremeManualDR):
    """ADR variant: noise magnitudes governed by the tensorized ADR engine."""

    OBS_KEYS = ADR_KEYS
    ACTOR_KEYS = ADR_ACTOR_KEYS
    CRITIC_KEYS = ADR_CRITIC_KEYS

    # tensorized ADR params (ref cfg/task/AllegroHandDextremeADR.yaml:286-400)
    ADR_DEFAULTS = {
        "adr": {
            "use_adr": True,
            "worker_adr_boundary_fraction": 0.4,
            "adr_queue_threshold_length": 256,
            "adr_objective_threshold_low": 5,
            "adr_objective_threshold_high": 20,
            "params": {
                "action_delay_prob": {"init_range": [0.0, 0.05], "limits": [0.0, 0.7], "delta": 0.01},
                "action_latency": {"init_range": [0.0, 0.0], "limits": [0, 60], "delta": 0.1},
                "affine_action_scaling": {"init_range": [0.0, 0.0], "limits": [0.0, 4.0], "delta": 0.01},
                "affine_action_additive": {"init_range": [0.0, 0.04], "limits": [0.0, 4.0], "delta": 0.01},
                "affine_action_white": {"init_range": [0.0, 0.04], "limits": [0.0, 4.0], "delta": 0.01},
                "affine_cube_pose_scaling": {"init_range": [0.0, 0.0], "limits": [0.0, 4.0], "delta": 0.01},
                "affine_cube_pose_additive": {"init_range": [0.0, 0.04], "limits": [0.0, 4.0], "delta": 0.01},
                "affine_cube_pose_white": {"init_range": [0.0, 0.04], "limits": [0.0, 4.0], "delta": 0.01},
                "affine_dof_pos_scaling": {"init_range": [0.0, 0.0], "limits": [0.0, 4.0], "delta": 0.01},
                "affine_dof_pos_additive": {"init_range": [0.0, 0.04], "limits": [0.0, 4.0], "delta": 0.01},
                "affine_dof_pos_white": {"init_range": [0.0, 0.04], "limits": [0.0, 4.0], "delta": 0.01},
                "rna_alpha": {"init_range": [0.0, 0.0], "limits": [0.0, 1.0], "delta": 0.01},
                "cube_obs_delay_prob": {"init_range": [0.0, 0.05], "limits": [0.0, 0.7], "delta": 0.01},
                "cube_pose_refresh_rate": {"init_range": [1.0, 1.0], "limits": [1, 6], "delta": 0.2},
            },
        }
    }

    def __init__(self, cfg):
        adr_cfg = cfg.get("task", {}).get("adr", self.ADR_DEFAULTS["adr"])
        super().__init__(cfg)
        self.adr = ADR(adr_cfg, self.num_envs)
        self._pidx = {n: self.adr.param_index(n) for n in self.adr.names}

    def _initial_ts(self, key):
        ts = super()._initial_ts(key)
        adr_state = self.adr.init_state(jax.random.fold_in(key, 77))
        # flatten ADRState into ts leaves (EnvState.ts is a flat dict pytree)
        ts["adr_worker_types"] = adr_state.worker_types
        ts["adr_modes"] = adr_state.adr_modes
        ts["adr_ranges"] = adr_state.ranges
        ts["adr_qsum"] = adr_state.queue_sum
        ts["adr_qcnt"] = adr_state.queue_count
        ts["adr_values"] = adr_state.values
        ts["adr_npd"] = adr_state.npd
        return ts

    def _adr_state(self, ts):
        from isaacgymenv_tpu.utils.adr import ADRState

        return ADRState(
            worker_types=ts["adr_worker_types"], adr_modes=ts["adr_modes"],
            ranges=ts["adr_ranges"], queue_sum=ts["adr_qsum"],
            queue_count=ts["adr_qcnt"], values=ts["adr_values"], npd=ts["adr_npd"],
        )

    def _store_adr(self, ts, st):
        ts["adr_worker_types"] = st.worker_types
        ts["adr_modes"] = st.adr_modes
        ts["adr_ranges"] = st.ranges
        ts["adr_qsum"] = st.queue_sum
        ts["adr_qcnt"] = st.queue_count
        ts["adr_values"] = st.values
        ts["adr_npd"] = st.npd
        return ts

    # -- env-state checkpoint surface (ref: adr_vec_task.py:368-399
    # get_env_state/set_env_state persist ADR ranges keyed by param name) --
    def get_env_state(self, state):
        ts = state.ts
        ranges = np.asarray(ts["adr_ranges"])
        return {
            "adr_params": {
                name: {"range": ranges[self._pidx[name]].tolist()}
                for name in self.adr.names
            },
            "adr_worker_types": np.asarray(ts["adr_worker_types"]),
            "adr_modes": np.asarray(ts["adr_modes"]),
            "adr_values": np.asarray(ts["adr_values"]),
            "adr_queue_sum": np.asarray(ts["adr_qsum"]),
            "adr_queue_count": np.asarray(ts["adr_qcnt"]),
            "adr_npd": np.asarray(ts["adr_npd"]),
        }

    def set_env_state(self, state, env_state_dict):
        if not env_state_dict:
            return state
        ts = dict(state.ts)
        d = env_state_dict
        ranges = np.asarray(jax.device_get(ts["adr_ranges"])).copy()
        for name, spec in d.get("adr_params", {}).items():
            if name in self._pidx and "range" in spec:
                ranges[self._pidx[name]] = np.asarray(spec["range"])
        ts["adr_ranges"] = jnp.asarray(ranges)
        for src, dst in [
            ("adr_worker_types", "adr_worker_types"), ("adr_modes", "adr_modes"),
            ("adr_values", "adr_values"), ("adr_queue_sum", "adr_qsum"),
            ("adr_queue_count", "adr_qcnt"), ("adr_npd", "adr_npd"),
        ]:
            if src in d:
                ts[dst] = jnp.asarray(d[src])
        return state.replace(ts=ts)

    def _adr_val(self, ts, name):
        return ts["adr_values"][:, self._pidx[name]]

    def _gaussian_adr(self, key, ts, name, dim):
        """exp(v^2)-1 stddev nonlinearity (ref sample_gaussian_adr :1383)."""
        v = self._adr_val(ts, name)[:, None]
        std = jnp.where(v > 0, jnp.exp(v**2) - 1.0, 0.0)
        return jax.random.normal(key, (self.num_envs, dim)) * std

    def _rna_alpha(self, state):
        return self._adr_val(state.ts, "rna_alpha")[:, None]

    def _make_control(self, state, actions):
        ts = dict(state.ts)
        k = jax.random.fold_in(state.rng, 58)
        k1, k2 = jax.random.split(k)
        scale = 1.0 + self._gaussian_adr(k1, ts, "affine_action_scaling", 16)
        add = self._gaussian_adr(k2, ts, "affine_action_additive", 16)
        white = self._gaussian_adr(jax.random.fold_in(k, 2), ts, "affine_action_white", 16)
        actions = scale * actions + add + white
        state = state.replace(ts=ts)
        return super()._make_control(state, actions)

    def _reward_done(self, state, obs, actions):
        state, reward, resets, info = super()._reward_done(state, obs, actions)
        # ADR update on episode boundaries; objective = consecutive successes
        ts = dict(state.ts)
        st = self._adr_state(ts)
        st = self.adr.on_reset(
            jax.random.fold_in(state.rng, 59), st, resets, ts["successes"].astype(jnp.float32)
        )
        ts = self._store_adr(ts, st)
        info = dict(info, adr_npd=st.npd, adr_mean_range=st.ranges.mean())
        return state.replace(ts=ts), reward, resets, info

    def _obs_dict(self, state, actions):
        # full ADR obs dict with the extra randomized/ADR blocks
        ts = state.ts
        p = self._obs_pieces(state)
        n = p["dp"].shape[0]
        k = jax.random.fold_in(state.rng, 60)
        dof_white = self._gaussian_adr(jax.random.fold_in(k, 1), ts, "affine_dof_pos_white", 16)
        dof_scale = 1.0 + self._gaussian_adr(jax.random.fold_in(k, 2), ts, "affine_dof_pos_scaling", 16)
        dof_add = self._gaussian_adr(jax.random.fold_in(k, 3), ts, "affine_dof_pos_additive", 16)
        dp_raw = dof_pos(self.model, state.sim)
        dp_rand = maths.unscale(
            dof_scale * dp_raw + dof_add + dof_white, self.dof_lower, self.dof_upper
        )
        pose_white = self._gaussian_adr(jax.random.fold_in(k, 4), ts, "affine_cube_pose_white", 7)
        pose_scale = 1.0 + self._gaussian_adr(jax.random.fold_in(k, 5), ts, "affine_cube_pose_scaling", 7)
        pose_add = self._gaussian_adr(jax.random.fold_in(k, 6), ts, "affine_cube_pose_additive", 7)
        cam_pose = ts["obs_object_pose"]
        cam_rand = pose_scale * cam_pose + pose_add + pose_white
        cam_rel_rot = maths.quat_mul(
            cam_rand[:, 3:7], maths.quat_conjugate(ts["goal_rot"])
        )
        best = ts["best_rot_dist"]
        delay_params = jnp.stack(
            [
                self._adr_val(ts, "cube_obs_delay_prob"),
                ts["pose_refresh_rate"].astype(jnp.float32) / 6.0,
                self._adr_val(ts, "action_delay_prob") if "action_delay_prob" in self.adr.names else ts["action_delay_prob"],
                ts["action_latency"].astype(jnp.float32) / 60.0,
            ],
            axis=1,
        )
        affine_params = jnp.concatenate(
            [dof_scale, dof_add, pose_scale, pose_add, dof_white * 0 + 1.0, dof_white * 0],
            axis=-1,
        )
        zeros = lambda d: jnp.zeros((n, d))
        pieces = {
            "dof_pos": p["dp"], "dof_pos_randomized": dp_rand, "dof_vel": p["dv"],
            "dof_force": p["dof_force"], "object_vels": p["obj_vels"],
            "last_actions": ts["actions"],
            "cube_random_params": self._cube_random_params(state, n),
            "hand_random_params": jnp.asarray(self.hand_scale_dr)[:, None],
            "gravity_vec": jnp.broadcast_to(jnp.asarray(self.model.gravity), (n, 3)),
            "ft_states": p["ft_states"], "ft_force_torques": p["ft_wrench"],
            "rb_forces": ts["rb_force"],
            "rot_dist": jnp.stack([p["rot_dist"], best], -1),
            "stochastic_delay_params": delay_params,
            "affine_params": affine_params,
            "object_pose": p["obj_pose"], "goal_pose": p["goal_pose"],
            "goal_relative_rot": p["goal_rel_rot"],
            "object_pose_cam_randomized": cam_rand,
            "goal_relative_rot_cam_randomized": cam_rel_rot,
        }
        return pieces
