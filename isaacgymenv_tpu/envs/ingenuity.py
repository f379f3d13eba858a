"""Ingenuity — Mars coaxial helicopter following a moving target.

Behavioral spec (ref: tasks/ingenuity.py):
- Mars gravity (0, 0, -3.721) (:122-126).
- procedural model (:134-232): chassis (box half-extent .06 rho=50) with two
  coaxial rotors (cylinder r=.15 t=.01 rho=1000) 0.025 m apart; the rotor
  joints are locked (range 0 0) so the rotors are rigid here (the spinning
  visual-only dummy rotors, :211-228, are cosmetic and not modeled).
- act (N, 6): per rotor [lateral_x, lateral_y, vertical] — vertical thrust
  dt * clamp(a*2000, +-2000), lateral components = thrust * clamp(a, +-0.2),
  applied LOCAL_SPACE at the two rotor bodies (:339-360).
- obs (N, 13): (target - pos)/3, quat, linvel/2, angvel/pi (:389-394).
- target: x,y ~ U(-5, 5), z ~ U(1, 2), resampled every 500 steps and on
  reset (:286-297, :325-328); the reference's marker actor is visual-only.
- reward (:412-440): pos 1/(1+d^2) * (1 + 5/(1+tilt^2) + 1/(1+spin^2));
  die on d > 8 or z < 0.5; timeout at maxEpisodeLength 2000.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.envs.registry import register
from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import builder as B
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.types import (
    JT_FIXED,
    JT_FREE,
    root_state,
    set_root_state,
)


def _build_ingenuity():
    mb = B.ModelBuilder()
    half = 0.06
    m_ch = 50.0 * (2 * half) ** 3
    chassis = mb.add_body(
        "chassis", -1, JT_FREE,
        mass=m_ch, inertia=B.box_inertia(m_ch, 2 * half, 2 * half, 2 * half),
    )
    rotors = []
    for i in range(2):
        r, t = 0.15, 0.01
        m_rot = 1000.0 * math.pi * r * r * t
        rotors.append(
            mb.add_body(
                f"rotor_physics_{i}", chassis, JT_FIXED,
                joint_pos=(0, 0, 0.025 * i),
                mass=m_rot, inertia=B.cylinder_inertia(m_rot, r, t),
            )
        )
    return mb, rotors


@register("Ingenuity")
class Ingenuity(TaskEnv):
    num_obs = 13
    num_actions = 6

    def __init__(self, cfg):
        super().__init__(cfg)
        mb, self.rotor_bodies = _build_ingenuity()
        mb.gravity = np.array(self.gravity)  # Mars: cfg gravity -3.721
        self.model = mb.finalize()
        self.thrust_limit = 2000.0
        self.thrust_lateral = 0.2

    def _initial_ts(self, key):
        n = self.num_envs
        t = jnp.zeros((n, 3)).at[:, 2].set(1.0)
        return {"target": t}

    def _sample_targets(self, key, n):
        kxy, kz = jax.random.split(key)
        xy = jax.random.uniform(kxy, (n, 2), minval=-5.0, maxval=5.0)
        z = jax.random.uniform(kz, (n, 1), minval=1.0, maxval=2.0)
        return jnp.concatenate([xy, z], -1)

    def _reset_envs(self, state, mask, key):
        m = self.model
        n = mask.shape[0]
        k_xyz, k_tgt = jax.random.split(key)
        rs = root_state(m, state.sim)[:, 0]
        init = jnp.zeros((n, 13)).at[:, 6].set(1.0).at[:, 2].set(1.0)
        noise = jax.random.uniform(
            k_xyz, (n, 3),
            minval=jnp.array([-1.5, -1.5, -0.2]), maxval=jnp.array([1.5, 1.5, 1.5]),
        )
        init = init.at[:, 0:3].add(noise)
        mm = mask[:, None]
        sim = set_root_state(m, state.sim, jnp.where(mm, init, rs))
        ts = dict(state.ts)
        ts["target"] = jnp.where(mm, self._sample_targets(k_tgt, n), ts["target"])
        return state.replace(
            sim=sim, progress=jnp.where(mask, 0, state.progress), ts=ts
        )

    def _post_physics(self, state, actions):
        # resample targets every 500 steps (ref: ingenuity.py:325-328)
        due = (state.progress % 500) == 0
        key = jax.random.fold_in(state.rng, 77)
        ts = dict(state.ts)
        ts["target"] = jnp.where(
            due[:, None], self._sample_targets(key, due.shape[0]), ts["target"]
        )
        return state.replace(ts=ts)

    def _make_control(self, state, actions):
        m = self.model
        n = actions.shape[0]
        wrench = jnp.zeros((n, m.nb, 6))
        for k, b in enumerate(self.rotor_bodies):
            a = actions[:, 3 * k : 3 * k + 3]
            vertical = self.dt * jnp.clip(
                a[:, 2] * 2000.0, -self.thrust_limit, self.thrust_limit
            )
            lateral = vertical[:, None] * jnp.clip(
                a[:, 0:2], -self.thrust_lateral, self.thrust_lateral
            )
            f_local = jnp.concatenate([lateral, vertical[:, None]], -1)
            f_w = maths.quat_rotate(state.sim.body_quat[:, b], f_local)
            wrench = wrench.at[:, b, 3:6].set(f_w)
        return engine.Control.zero(m, n).replace(body_wrench=wrench)

    def _observations(self, state, actions):
        rs = root_state(self.model, state.sim)[:, 0]
        return jnp.concatenate(
            [
                (state.ts["target"] - rs[:, 0:3]) / 3.0,
                rs[:, 3:7],
                rs[:, 7:10] / 2.0,
                rs[:, 10:13] / math.pi,
            ],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        rs = root_state(self.model, state.sim)[:, 0]
        pos, quat = rs[:, 0:3], rs[:, 3:7]
        target_dist = jnp.linalg.norm(state.ts["target"] - pos, axis=-1)
        pos_reward = 1.0 / (1.0 + target_dist * target_dist)
        ups = maths.quat_axis(quat, 2)
        tiltage = jnp.abs(1.0 - ups[..., 2])
        up_reward = 5.0 / (1.0 + tiltage * tiltage)
        spinnage = jnp.abs(rs[:, 12])
        spin_reward = 1.0 / (1.0 + spinnage * spinnage)
        reward = pos_reward + pos_reward * (up_reward + spin_reward)

        die = (target_dist > 8.0) | (pos[:, 2] < 0.5)
        timeout = state.progress >= self.max_episode_length - 1
        done = die | timeout
        return state, reward, done, {}
