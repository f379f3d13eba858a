"""Cartpole — the minimal exemplar task.

Behavioral spec from the reference (ref: tasks/cartpole.py):
- obs (N, 4): [cart_pos, cart_vel, pole_angle, pole_vel]  (cartpole.py:137-143)
- act (N, 1): effort on the cart dof, scaled by maxEffort   (cartpole.py:160-163)
- reward: 1 - pole_angle^2 - 0.01|cart_vel| - 0.005|pole_vel|;
  -2 when |cart_pos| > resetDist or |pole_angle| > pi/2      (cartpole.py:178-196)
- reset when |x|>resetDist, |theta|>pi/2, or progress >= 500 - 1
- reset state: dof pos ~ U(-0.1, 0.1), dof vel ~ U(-0.25, 0.25) (cartpole.py:148-151)
- asset: urdf/cartpole.urdf, fixed base at z=2, cart dof EFFORT drive,
  pole dof NONE (cartpole.py:88-113)
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.types import DRIVE_EFFORT, DRIVE_NONE, set_dof_state
from isaacgymenv_tpu.physics.urdf import AssetOptions, load_urdf
from isaacgymenv_tpu.utils.config import asset_root


class Cartpole(TaskEnv):
    num_obs = 4
    num_actions = 1

    def __init__(self, cfg):
        super().__init__(cfg)
        self.reset_dist = float(cfg["env"]["resetDist"])
        self.max_push_effort = float(cfg["env"]["maxEffort"])

        asset_file = cfg["env"].get("asset", {}).get("assetFileName", "urdf/cartpole.urdf")
        mb, info = load_urdf(
            os.path.join(asset_root(), asset_file),
            AssetOptions(fix_base_link=True),
            base_pos=(0.0, 0.0, 2.0),
        )
        # drive modes: cart EFFORT, pole NONE; zero stiffness/damping
        # (ref: cartpole.py:108-113)
        for b in mb.bodies:
            b.stiffness = 0.0
            b.damping = 0.0
        mb.bodies[info["link_body"]["cart"]].drive_mode = DRIVE_EFFORT
        mb.bodies[info["link_body"]["pole"]].drive_mode = DRIVE_NONE
        mb.gravity = jnp.array(self.gravity)
        self.model = mb.finalize()
        self.terrain = None
        self._cart_dof = self.model.dof_index("slider_to_cart")
        self._pole_dof = self.model.dof_index("cart_to_pole")

    def _reset_envs(self, state, mask, key):
        k1, k2 = jax.random.split(key)
        n = mask.shape[0]  # local batch (may be a mesh shard of num_envs)
        nd = self.model.nd
        pos = 0.2 * (jax.random.uniform(k1, (n, nd)) - 0.5)
        vel = 0.5 * (jax.random.uniform(k2, (n, nd)) - 0.5)
        from isaacgymenv_tpu.physics.types import dof_pos, dof_vel

        cur_pos = dof_pos(self.model, state.sim)
        cur_vel = dof_vel(self.model, state.sim)
        m = mask[:, None]
        sim = set_dof_state(
            self.model,
            state.sim,
            jnp.where(m, pos, cur_pos),
            jnp.where(m, vel, cur_vel),
        )
        return state.replace(
            sim=sim,
            progress=jnp.where(mask, 0, state.progress),
        )

    def _make_control(self, state, actions):
        n = actions.shape[0]
        ctrl = engine.Control.zero(self.model, n)
        effort = jnp.zeros((n, self.model.nd))
        effort = effort.at[:, self._cart_dof].set(actions[:, 0] * self.max_push_effort)
        return ctrl.replace(effort=effort)

    def _observations(self, state, actions):
        from isaacgymenv_tpu.physics.types import dof_pos, dof_vel

        p = dof_pos(self.model, state.sim)
        v = dof_vel(self.model, state.sim)
        return jnp.stack(
            [
                p[:, self._cart_dof],
                v[:, self._cart_dof],
                p[:, self._pole_dof],
                v[:, self._pole_dof],
            ],
            axis=-1,
        )

    def _reward_done(self, state, obs, actions):
        cart_pos, cart_vel, pole_angle, pole_vel = obs[:, 0], obs[:, 1], obs[:, 2], obs[:, 3]
        reward = (
            1.0 - pole_angle * pole_angle - 0.01 * jnp.abs(cart_vel) - 0.005 * jnp.abs(pole_vel)
        )
        oob = (jnp.abs(cart_pos) > self.reset_dist) | (jnp.abs(pole_angle) > math.pi / 2)
        reward = jnp.where(oob, -2.0, reward)
        done = oob | (state.progress >= self.max_episode_length - 1)
        return state, reward, done, {}
