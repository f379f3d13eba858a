"""HumanoidAMP — style imitation via Adversarial Motion Priors.

Behavioral spec (ref: tasks/humanoid_amp.py + tasks/amp/humanoid_amp_base.py):
- amp_humanoid.xml: 28-dof humanoid (8 exp-map "spherical" triplets + 4
  hinges), PD position control with exp-map action parameterization
  (_build_pd_action_offset_scale, humanoid_amp_base.py:262-295); MJCF
  stiffness/damping are the PD gains; 30 Hz control (controlFrequencyInv 2).
- obs (N, 105): [root_h(1), root_rot tan-norm(6), root vel(3), ang vel(3)
  heading-localized, dof_obs(52: exp-map->quat->tan-norm per 3-dof joint),
  dof_vel(28), key body pos local(12)] (compute_humanoid_observations :495).
- task reward = 1.0 — all signal comes from the AMP discriminator
  (learning/amp.py) via extras["amp_obs"] (2-step window, 210 dims).
- termination: contact on any non-foot body AND that body below
  terminationHeight (compute_humanoid_reset :537-562).
- reset: reference state init from MotionLib (Random/Start/Hybrid/Default,
  humanoid_amp.py:151-230); the AMP obs history is seeded from the motion.
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
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.mjcf import MJCFOptions, load_mjcf
from isaacgymenv_tpu.physics.types import (
    DRIVE_POS,
    dof_pos,
    dof_vel,
    root_state,
    set_dof_state,
    set_root_state,
)
from isaacgymenv_tpu.utils.config import asset_root
from isaacgymenv_tpu.utils.motion_lib import DOF_OFFSETS, MotionLib

NUM_OBS = 13 + 52 + 28 + 12  # ref: humanoid_amp_base.py:43
KEY_BODY_NAMES = ("right_hand", "left_hand", "right_foot", "left_foot")


def dof_to_obs(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., 28) dof pos -> (..., 52) [tan-norm per 3-dof joint, angle per
    hinge] (ref: humanoid_amp_base.py dof_to_obs :464)."""
    parts = []
    for j in range(len(DOF_OFFSETS) - 1):
        o, o1 = DOF_OFFSETS[j], DOF_OFFSETS[j + 1]
        jp = pose[..., o:o1]
        if o1 - o == 3:
            parts.append(maths.quat_to_tan_norm(maths.exp_map_to_quat(jp)))
        else:
            parts.append(jp)
    return jnp.concatenate(parts, axis=-1)


def build_amp_observations(root_states, dp, dv, key_body_pos, local_root_obs):
    """ref: compute_humanoid_observations / build_amp_observations (:495)."""
    root_pos = root_states[..., 0:3]
    root_rot = root_states[..., 3:7]
    root_vel = root_states[..., 7:10]
    root_ang_vel = root_states[..., 10:13]

    root_h = root_pos[..., 2:3]
    heading_rot = maths.calc_heading_quat_inv(root_rot)
    root_rot_obs = (
        maths.quat_mul(heading_rot, root_rot) if local_root_obs else root_rot
    )
    root_rot_obs = maths.quat_to_tan_norm(root_rot_obs)
    local_root_vel = maths.quat_apply(heading_rot, root_vel)
    local_root_ang_vel = maths.quat_apply(heading_rot, root_ang_vel)

    local_key = key_body_pos - root_pos[..., None, :]
    hr = jnp.broadcast_to(heading_rot[..., None, :], local_key.shape[:-1] + (4,))
    local_key = maths.quat_apply(hr, local_key)
    flat_key = local_key.reshape(local_key.shape[:-2] + (-1,))

    return jnp.concatenate(
        [
            root_h, root_rot_obs, local_root_vel, local_root_ang_vel,
            dof_to_obs(dp), dv, flat_key,
        ],
        axis=-1,
    )


@register("HumanoidAMP")
class HumanoidAMP(TaskEnv):
    num_obs = NUM_OBS
    num_actions = 28

    def __init__(self, cfg):
        e = cfg["env"]
        e.setdefault("maxEpisodeLength", int(e.get("episodeLength", 300)))
        e.setdefault("controlFrequencyInv", 2)
        super().__init__(cfg)
        self.local_root_obs = bool(e.get("localRootObs", False))
        self.termination_height = float(e.get("terminationHeight", 0.5))
        self.early_termination = bool(e.get("enableEarlyTermination", True))
        self.state_init = e.get("stateInit", "Random")
        self.hybrid_init_prob = float(e.get("hybridInitProb", 0.5))
        self.num_amp_obs_steps = int(e.get("numAMPObsSteps", 2))
        self.num_amp_obs = self.num_amp_obs_steps * NUM_OBS

        self._build_model(cfg)
        motion_file = e.get("motion_file", "amp_humanoid_run.npy")
        path = motion_file
        if not os.path.isabs(path):
            path = os.path.join(asset_root(), "amp/motions", motion_file)
        self.motion_lib = MotionLib(path, self.model.nd, KEY_BODY_NAMES)
        # control period for amp obs spacing (30 Hz)
        self.amp_dt = self.dt * self.control_freq_inv

    def _build_model(self, cfg):
        mb, info = load_mjcf(
            os.path.join(asset_root(), "mjcf/amp_humanoid.xml"), MJCFOptions()
        )
        for b in mb.bodies:
            if b.jtype in (1, 2):
                b.drive_mode = DRIVE_POS  # gains already from MJCF attrs
        mb.gravity = np.array(self.gravity)
        self.model = attach_effective_masses(mb.finalize())
        self._info = info
        names = self.model.body_names
        lb = info["link_body"]
        self.key_bodies = np.array([lb[n] for n in KEY_BODY_NAMES])
        contact_names = cfg["env"].get("contactBodies", ["right_foot", "left_foot"])
        self.contact_bodies = np.array([lb[n] for n in contact_names])
        # real (non-phantom) bodies for fall detection
        self.real_bodies = np.array(
            [i for i, n in enumerate(names) if "__ph" not in n]
        )
        # PD action offset/scale (ref: _build_pd_action_offset_scale :262)
        lo = np.asarray(self.model.dof_lower).copy()
        hi = np.asarray(self.model.dof_upper).copy()
        for j in range(len(DOF_OFFSETS) - 1):
            o, o1 = DOF_OFFSETS[j], DOF_OFFSETS[j + 1]
            if o1 - o == 3:
                lo[o:o1], hi[o:o1] = -np.pi, np.pi
            else:
                mid = 0.5 * (hi[o] + lo[o])
                s = 0.7 * (hi[o] - lo[o])
                lo[o], hi[o] = mid - s, mid + s
        self.pd_offset = jnp.array(0.5 * (hi + lo), jnp.float32)
        self.pd_scale = jnp.array(0.5 * (hi - lo), jnp.float32)

    # ------------------------------------------------------------------
    def _initial_ts(self, key):
        n = self.num_envs
        return {
            "amp_hist": jnp.zeros((n, self.num_amp_obs_steps, NUM_OBS)),
        }

    def _amp_obs_now(self, state):
        m = self.model
        rs = root_state(m, state.sim)[:, 0]
        dp = dof_pos(m, state.sim)
        dv = dof_vel(m, state.sim)
        key_pos = state.sim.body_pos[:, self.key_bodies]
        return build_amp_observations(rs, dp, dv, key_pos, self.local_root_obs)

    def _motion_amp_obs(self, ids, times):
        rp, rr, dp, rv, rav, dv, kp = self.motion_lib.get_motion_state(ids, times)
        rs = jnp.concatenate([rp, rr, rv, rav], axis=-1)
        return build_amp_observations(rs, dp, dv, kp, self.local_root_obs)

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        k_mid, k_time, k_hyb = jax.random.split(key, 3)
        ids = self.motion_lib.sample_motions(k_mid, n)
        if self.state_init == "Start":
            times = jnp.zeros(n)
        else:
            times = self.motion_lib.sample_time(k_time, ids)
        rp, rr, dp_m, rv, rav, dv_m, kp = self.motion_lib.get_motion_state(ids, times)

        if self.state_init == "Hybrid":
            # prob of ref-state init, else default pose (ref :215-230)
            use_ref = (
                jax.random.uniform(k_hyb, (n,)) < self.hybrid_init_prob
            )
        elif self.state_init == "Default":
            use_ref = jnp.zeros(n, bool)
        else:
            use_ref = jnp.ones(n, bool)

        default_root = jnp.zeros((n, 13)).at[:, 6].set(1.0).at[:, 2].set(0.89)
        default_dof = jnp.zeros((n, m.nd))
        new_root = jnp.where(use_ref[:, None], jnp.concatenate([rp, rr, rv, rav], -1), default_root)
        new_dp = jnp.where(use_ref[:, None], dp_m, default_dof)
        new_dv = jnp.where(use_ref[:, None], dv_m, 0.0)

        rs = root_state(m, state.sim)[:, 0]
        mm = mask[:, None]
        sim = set_root_state(m, state.sim, jnp.where(mm, new_root, rs))
        sim = set_dof_state(
            m, sim,
            jnp.where(mm, new_dp, dof_pos(m, sim)),
            jnp.where(mm, new_dv, dof_vel(m, sim)),
        )
        # seed the AMP obs history from the motion at t, t-dt, ...
        # (ref: _init_amp_obs_ref, humanoid_amp.py:253-270)
        ts = dict(state.ts)
        hist = []
        for s in range(self.num_amp_obs_steps):
            t_s = jnp.maximum(times - s * self.amp_dt, 0.0)
            hist.append(self._motion_amp_obs(ids, t_s))
        hist = jnp.stack(hist, axis=1)  # (n, steps, 105)
        ts["amp_hist"] = jnp.where(mask[:, None, None], hist, ts["amp_hist"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    # ------------------------------------------------------------------
    def _make_control(self, state, actions):
        targets = self.pd_offset + self.pd_scale * actions
        return engine.Control.zero(self.model, actions.shape[0]).replace(
            pos_target=targets
        )

    def _post_physics(self, state, actions):
        # shift AMP history and insert the current obs (ref :232-245)
        ts = dict(state.ts)
        cur = self._amp_obs_now(state)
        hist = jnp.concatenate(
            [cur[:, None], ts["amp_hist"][:, :-1]], axis=1
        )
        ts["amp_hist"] = hist
        return state.replace(ts=ts)

    def _observations(self, state, actions):
        return self._amp_obs_now(state)

    def _reward_done(self, state, obs, actions):
        """reward = 1; early termination on non-foot contact while low
        (ref: compute_humanoid_reset :537-562)."""
        reward = jnp.ones(obs.shape[0])
        cf = state.sim.contact_force[:, self.real_bodies]
        body_h = state.sim.body_pos[:, self.real_bodies, 2]
        is_contact_body = jnp.isin(
            jnp.asarray(self.real_bodies), jnp.asarray(self.contact_bodies)
        )
        fall_contact = jnp.any(
            jnp.any(jnp.abs(cf) > 0.1, axis=-1) & ~is_contact_body, axis=-1
        )
        fall_height = jnp.any(
            (body_h < self.termination_height) & ~is_contact_body, axis=-1
        )
        has_fallen = fall_contact & fall_height & (state.progress > 1)
        done = (self.early_termination & has_fallen) | (
            state.progress >= self.max_episode_length - 1
        )
        info = {
            "amp_obs": state.ts["amp_hist"].reshape(obs.shape[0], -1),
            "terminate": has_fallen,
        }
        return state, reward, done, info

    # ------------------------------------------------------------------ AMP
    def fetch_amp_obs_demo(self, key: jax.Array, num_samples: int) -> jnp.ndarray:
        """Sample expert (s, s', ...) windows (ref: humanoid_amp.py:105-134)."""
        k_id, k_t = jax.random.split(key)
        ids = self.motion_lib.sample_motions(k_id, num_samples)
        t0 = self.motion_lib.sample_time(
            k_t, ids, truncate=self.amp_dt * (self.num_amp_obs_steps - 1)
        ) + self.amp_dt * (self.num_amp_obs_steps - 1)
        obs = []
        for s in range(self.num_amp_obs_steps):
            obs.append(self._motion_amp_obs(ids, t0 - s * self.amp_dt))
        return jnp.stack(obs, axis=1).reshape(num_samples, -1)
