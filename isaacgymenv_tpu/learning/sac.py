"""On-device SAC — parity with rl_games' `sac` algo (AntSAC/AnymalSAC/
HumanoidSAC configs, ref: cfg/train/AntSAC.yaml, SURVEY.md §2.2 L4).

Twin soft Q critics + tanh-gaussian actor + learnable temperature, with the
replay buffer living in device memory as a fixed-size ring (uniform
sampling), so collection and updates fuse into one jit per epoch like the
PPO path.  Epoch structure mirrors rl_games: `num_steps_per_episode` env
steps across all actors, then one gradient update per collected step.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from isaacgymenv_tpu.envs.base import TaskEnv
from isaacgymenv_tpu.learning.running_stats import RunningStats


class TanhGaussianActor(nn.Module):
    num_actions: int
    units: tuple = (512, 256)
    activation: str = "relu"
    log_std_bounds: tuple = (-5.0, 2.0)

    @nn.compact
    def __call__(self, obs):
        act = {"relu": nn.relu, "elu": nn.elu, "tanh": nn.tanh}[self.activation]
        x = obs
        for i, u in enumerate(self.units):
            x = act(nn.Dense(u, name=f"dense_{i}")(x))
        mu = nn.Dense(self.num_actions, name="mu")(x)
        log_std = nn.Dense(self.num_actions, name="log_std")(x)
        lo, hi = self.log_std_bounds
        # rl_games squashes log_std into bounds with tanh
        log_std = lo + 0.5 * (hi - lo) * (jnp.tanh(log_std) + 1.0)
        return mu, log_std


class DoubleQ(nn.Module):
    units: tuple = (512, 256)
    activation: str = "relu"

    @nn.compact
    def __call__(self, obs, action):
        act = {"relu": nn.relu, "elu": nn.elu, "tanh": nn.tanh}[self.activation]
        x0 = jnp.concatenate([obs, action], axis=-1)

        def q(name):
            x = x0
            for i, u in enumerate(self.units):
                x = act(nn.Dense(u, name=f"{name}_dense_{i}")(x))
            return nn.Dense(1, name=f"{name}_out")(x)[..., 0]

        return q("q1"), q("q2")


def _per_env_normal(key, mu, offset=0):
    """Gaussian noise keyed per (global) env index — independent of how the
    batch is sharded over devices (see PPO._policy_noise)."""
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        key, offset + jnp.arange(mu.shape[0])
    )
    return jax.vmap(lambda k: jax.random.normal(k, mu.shape[1:], mu.dtype))(keys)


def _sample_action(key, mu, log_std, eps=None):
    std = jnp.exp(log_std)
    if eps is None:
        eps = jax.random.normal(key, mu.shape)
    pre = mu + std * eps
    a = jnp.tanh(pre)
    # tanh-squashed gaussian log-prob
    logp = jnp.sum(
        -0.5 * eps**2 - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1
    ) - jnp.sum(jnp.log(jnp.clip(1 - a**2, 1e-6, None)), axis=-1)
    return a, logp


@struct.dataclass
class SACState:
    actor: Any
    critic: Any
    critic_target: Any
    log_alpha: jnp.ndarray
    opt_actor: Any
    opt_critic: Any
    opt_alpha: Any
    obs_stats: RunningStats
    replay: Dict[str, jnp.ndarray]
    ptr: jnp.ndarray
    size: jnp.ndarray
    env_state: Any
    last_obs: jnp.ndarray
    key: jax.Array
    epoch: jnp.ndarray
    ep_return: jnp.ndarray
    ep_length: jnp.ndarray
    mean_return: jnp.ndarray
    mean_length: jnp.ndarray


class SAC:
    def __init__(self, env: TaskEnv, train_cfg: Dict[str, Any], axis_name=None):
        # axis_name: mesh axis for data-parallel training inside shard_map
        # (gradients/statistics pmean'd over it; None = single shard)
        self.axis_name = axis_name
        self.env = env
        p = train_cfg["params"]
        net = p.get("network", {})
        mlp = net.get("mlp", {})
        c = p["config"]
        self.cfg = c
        units = tuple(mlp.get("units", [512, 256]))
        activation = mlp.get("activation", "relu")
        self.actor_net = TanhGaussianActor(
            num_actions=env.num_actions,
            units=units,
            activation=activation,
            log_std_bounds=tuple(net.get("log_std_bounds", [-5, 2])),
        )
        self.critic_net = DoubleQ(units=units, activation=activation)
        self.gamma = float(c.get("gamma", 0.99))
        self.tau = float(c.get("critic_tau", 0.005))
        self.batch_size = int(c.get("batch_size", 4096))
        self.steps_per_epoch = int(c.get("num_steps_per_episode", 8))
        self.capacity = int(c.get("replay_buffer_size", 1_000_000))
        self.learnable_temperature = bool(c.get("learnable_temperature", True))
        self.init_alpha = float(c.get("init_alpha", 1.0))
        self.num_seed_steps = int(c.get("num_seed_steps", 5))
        self.num_warmup_steps = int(c.get("num_warmup_steps", 10))
        self.normalize_input = bool(c.get("normalize_input", True))
        self.reward_scale = float(c.get("reward_shaper", {}).get("scale_value", 1.0))
        self.target_entropy = -env.num_actions
        self.tx_actor = optax.adam(float(c.get("actor_lr", 5e-4)))
        self.tx_critic = optax.adam(float(c.get("critic_lr", 5e-4)))
        self.tx_alpha = optax.adam(float(c.get("alpha_lr", 5e-3)))

    # ------------------------------------------------------------------
    def init(self, seed: int) -> SACState:
        key = jax.random.PRNGKey(seed)
        key, k_env, k_a, k_c = jax.random.split(key, 4)
        env_state = self.env.initial_state(k_env)
        obs = self.env.observations(env_state)["obs"]
        o1 = obs[:1]
        a1 = jnp.zeros((1, self.env.num_actions))
        actor = self.actor_net.init(k_a, o1)
        critic = self.critic_net.init(k_c, o1, a1)
        cap = self.capacity
        replay = dict(
            obs=jnp.zeros((cap, self.env.num_obs)),
            next_obs=jnp.zeros((cap, self.env.num_obs)),
            action=jnp.zeros((cap, self.env.num_actions)),
            reward=jnp.zeros((cap,)),
            not_terminal=jnp.zeros((cap,)),
        )
        N = self.env.num_envs
        return SACState(
            actor=actor,
            critic=critic,
            critic_target=jax.tree.map(jnp.copy, critic),
            log_alpha=jnp.asarray(np.log(self.init_alpha), jnp.float32),
            opt_actor=self.tx_actor.init(actor),
            opt_critic=self.tx_critic.init(critic),
            opt_alpha=self.tx_alpha.init(jnp.zeros(())),
            obs_stats=RunningStats.create((self.env.num_obs,)),
            replay=replay,
            ptr=jnp.asarray(0, jnp.int32),
            size=jnp.asarray(0, jnp.int32),
            env_state=env_state,
            last_obs=obs,
            key=key,
            epoch=jnp.asarray(0, jnp.int32),
            ep_return=jnp.zeros(N),
            ep_length=jnp.zeros(N),
            mean_return=jnp.zeros((), jnp.float32),
            mean_length=jnp.zeros((), jnp.float32),
        )

    def _norm(self, stats, obs):
        return stats.normalize(obs) if self.normalize_input else obs

    def _pmean(self, x):
        return jax.lax.pmean(x, self.axis_name) if self.axis_name else x

    def _env_offset(self, n_loc):
        if self.axis_name is None:
            return 0
        return jax.lax.axis_index(self.axis_name) * n_loc

    # ------------------------------------------------------------------
    def _collect(self, ts: SACState):
        """steps_per_epoch env steps -> ring buffer."""

        def step_fn(carry, _):
            env_state, obs, key, ep_ret, ep_len, m_ret, m_len = carry
            key, k_act = jax.random.split(key)
            n_obs = self._norm(ts.obs_stats, obs)
            mu, log_std = self.actor_net.apply(ts.actor, n_obs)
            # per-global-env-keyed noise: shard-independent exploration
            off = self._env_offset(mu.shape[0])
            eps = _per_env_normal(k_act, mu, off)
            a_pol, _ = _sample_action(k_act, mu, log_std, eps=eps)
            # random uniform actions during seed epochs (rl_games behavior)
            ukeys = jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.fold_in(k_act, 17), off + jnp.arange(mu.shape[0])
            )
            a_rand = jax.vmap(
                lambda k: jax.random.uniform(k, mu.shape[1:], minval=-1.0, maxval=1.0)
            )(ukeys)
            action = jnp.where(ts.epoch < self.num_seed_steps, a_rand, a_pol)
            env_state, obs_dict, rew_raw, done, extras = self.env.step(env_state, action)
            rew = rew_raw * self.reward_scale
            not_terminal = 1.0 - (done & ~extras["time_outs"]).astype(jnp.float32)

            d = done.astype(jnp.float32)
            ep_ret = ep_ret + rew_raw
            ep_len = ep_len + 1.0
            n_done = jnp.maximum(d.sum(), 1.0)
            # count-weighted EMA (one decay per finished episode; see ppo.py)
            a = jnp.power(0.99, d.sum())
            m_ret = a * m_ret + (1.0 - a) * (ep_ret * d).sum() / n_done
            m_len = a * m_len + (1.0 - a) * (ep_len * d).sum() / n_done
            ep_ret = ep_ret * (1 - d)
            ep_len = ep_len * (1 - d)

            tr = dict(obs=obs, next_obs=obs_dict["obs"], action=action, reward=rew,
                      not_terminal=not_terminal)
            return (env_state, obs_dict["obs"], key, ep_ret, ep_len, m_ret, m_len), tr

        carry0 = (ts.env_state, ts.last_obs, ts.key, ts.ep_return, ts.ep_length,
                  ts.mean_return, ts.mean_length)
        carry, batch = jax.lax.scan(step_fn, carry0, None, length=self.steps_per_epoch)
        env_state, last_obs, key, ep_ret, ep_len, m_ret, m_len = carry

        # flatten (T, N, ...) -> (T*N, ...) and ring-write.  Capacity/batch
        # come from runtime shapes: under shard_map the replay and env batch
        # are the per-shard shards (ptr/size stay replicated because every
        # shard writes the same LOCAL count each epoch)
        B = self.steps_per_epoch * last_obs.shape[0]
        cap = ts.replay["obs"].shape[0]
        idx = (ts.ptr + jnp.arange(B)) % cap
        replay = dict(ts.replay)
        for k in replay:
            flat = batch[k].reshape((B,) + batch[k].shape[2:])
            replay[k] = replay[k].at[idx].set(flat)
        obs_stats = (
            ts.obs_stats.update(batch["obs"].reshape(B, -1), self.axis_name)
            if self.normalize_input
            else ts.obs_stats
        )
        ts = ts.replace(
            env_state=env_state, last_obs=last_obs, key=key, replay=replay,
            ptr=(ts.ptr + B) % cap,
            size=jnp.minimum(ts.size + B, cap),
            obs_stats=obs_stats,
            ep_return=ep_ret, ep_length=ep_len,
            mean_return=self._pmean(m_ret), mean_length=self._pmean(m_len),
        )
        return ts

    # ------------------------------------------------------------------
    def _update_once(self, ts: SACState, key):
        if self.axis_name is not None:
            # shard-local minibatch sampling from the local replay shard
            key = jax.random.fold_in(key, jax.lax.axis_index(self.axis_name))
        k_samp, k_next, k_cur = jax.random.split(key, 3)
        idx = jax.random.randint(k_samp, (self.batch_size,), 0, jnp.maximum(ts.size, 1))
        mb = {k: v[idx] for k, v in ts.replay.items()}
        n_obs = self._norm(ts.obs_stats, mb["obs"])
        n_next = self._norm(ts.obs_stats, mb["next_obs"])
        alpha = jnp.exp(ts.log_alpha)

        # critic target
        mu_n, ls_n = self.actor_net.apply(ts.actor, n_next)
        a_next, logp_next = _sample_action(k_next, mu_n, ls_n)
        q1t, q2t = self.critic_net.apply(ts.critic_target, n_next, a_next)
        v_next = jnp.minimum(q1t, q2t) - alpha * logp_next
        target = mb["reward"] + self.gamma * mb["not_terminal"] * v_next
        target = jax.lax.stop_gradient(target)

        def critic_loss(cp):
            q1, q2 = self.critic_net.apply(cp, n_obs, mb["action"])
            return ((q1 - target) ** 2).mean() + ((q2 - target) ** 2).mean()

        c_loss, c_grads = jax.value_and_grad(critic_loss)(ts.critic)
        c_grads = self._pmean(c_grads)
        c_loss = self._pmean(c_loss)
        c_updates, opt_critic = self.tx_critic.update(c_grads, ts.opt_critic)
        critic = optax.apply_updates(ts.critic, c_updates)

        def actor_loss(ap):
            mu, ls = self.actor_net.apply(ap, n_obs)
            a, logp = _sample_action(k_cur, mu, ls)
            q1, q2 = self.critic_net.apply(critic, n_obs, a)
            return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

        (a_loss, logp), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(ts.actor)
        a_grads = self._pmean(a_grads)
        a_loss = self._pmean(a_loss)
        a_updates, opt_actor = self.tx_actor.update(a_grads, ts.opt_actor)
        actor = optax.apply_updates(ts.actor, a_updates)

        if self.learnable_temperature:
            def alpha_loss(la):
                return (jnp.exp(la) * jax.lax.stop_gradient(-logp - self.target_entropy)).mean()

            al_loss, al_grad = jax.value_and_grad(alpha_loss)(ts.log_alpha)
            al_grad = self._pmean(al_grad)
            al_updates, opt_alpha = self.tx_alpha.update(al_grad, ts.opt_alpha)
            log_alpha = optax.apply_updates(ts.log_alpha, al_updates)
        else:
            log_alpha, opt_alpha = ts.log_alpha, ts.opt_alpha

        critic_target = jax.tree.map(
            lambda t, s: (1 - self.tau) * t + self.tau * s, ts.critic_target, critic
        )
        ts = ts.replace(
            actor=actor, critic=critic, critic_target=critic_target,
            log_alpha=log_alpha, opt_actor=opt_actor, opt_critic=opt_critic,
            opt_alpha=opt_alpha,
        )
        return ts, dict(c_loss=c_loss, a_loss=a_loss, alpha=alpha)

    # ------------------------------------------------------------------
    # collection and updates are SEPARATE jit programs (same reason as
    # PPO.train_epoch: fused Pallas env + SGD scans in one program compile
    # pathologically slowly via the remote TPU compile relay)
    @partial(jax.jit, static_argnums=0)
    def _collect_jit(self, ts: SACState):
        return self._collect(ts)

    def train_epoch(self, ts: SACState):
        ts = self._collect_jit(ts)
        return self._update_epoch_jit(ts)

    @partial(jax.jit, static_argnums=0)
    def _update_epoch_jit(self, ts: SACState):
        return self._update_epoch(ts)

    def _update_epoch(self, ts: SACState):
        def upd(ts, key):
            return self._update_once(ts, key)

        keys = jax.random.split(jax.random.fold_in(ts.key, 1), self.steps_per_epoch)

        def body(ts, key):
            # no updates during warmup epochs (rl_games num_warmup_steps)
            def skip(ts, key):
                return ts, dict(
                    c_loss=jnp.asarray(0.0), a_loss=jnp.asarray(0.0),
                    alpha=jnp.exp(ts.log_alpha),
                )

            return jax.lax.cond(ts.epoch >= self.num_warmup_steps, upd, skip, ts, key)

        ts, infos = jax.lax.scan(body, ts, keys)
        ts = ts.replace(epoch=ts.epoch + 1)
        info = {k: v[-1] for k, v in infos.items()}
        info["mean_return"] = ts.mean_return
        info["mean_length"] = ts.mean_length
        return ts, info

    def train(self, seed: int = 42, max_epochs=None, log_every: int = 200,
              callback=None, init_ts=None):
        ts = init_ts if init_ts is not None else self.init(seed)
        epochs = max_epochs or int(self.cfg.get("max_epochs", 1000))
        steps_per = self.steps_per_epoch * self.env.num_envs
        t0 = time.time()
        for ep in range(epochs):
            ts, info = self.train_epoch(ts)
            if callback is not None:
                callback(ep, ts, info)
            if log_every and (ep % log_every == 0 or ep == epochs - 1):
                jax.block_until_ready(info["c_loss"])
                fps = steps_per * (ep + 1) / (time.time() - t0)
                print(
                    f"sac epoch {ep:6d} | return {float(info['mean_return']):9.2f} "
                    f"| len {float(info['mean_length']):6.1f} | alpha {float(info['alpha']):.3f} "
                    f"| closs {float(info['c_loss']):.3f} | fps {fps:,.0f}"
                )
        return ts

    def act(self, ts: SACState, obs, deterministic: bool = True, key=None):
        """Inference policy (player path parity)."""
        mu, log_std = self.actor_net.apply(ts.actor, self._norm(ts.obs_stats, obs))
        if deterministic or key is None:
            return jnp.tanh(mu)
        a, _ = _sample_action(key, mu, log_std)
        return a
