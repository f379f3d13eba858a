"""On-device PPO: rollout (lax.scan) + GAE + minibatch SGD in ONE jit.

Replaces the reference's rl_games `A2CAgent.train` host loop (SURVEY.md §3.1
hot loops 3-4) with a fully fused device program: env stepping, advantage
computation and all mini-epoch updates execute without host round-trips;
the host only reads back scalar metrics once per epoch.

Config keys follow cfg/train/*PPO.yaml verbatim (gamma/tau/e_clip/
horizon_length/minibatch_size/mini_epochs/kl_threshold/...); semantics match
rl_games a2c_continuous: clipped surrogate + clipped value loss, fixed-sigma
gaussian policy, running obs/value normalization, adaptive-KL LR schedule
(ref: learning/common_agent.py:216-236, 406-428, 475-510).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from isaacgymenv_tpu.envs.base import EnvState, TaskEnv
from isaacgymenv_tpu.learning import networks
from isaacgymenv_tpu.learning.running_stats import RunningStats


@struct.dataclass
class PPOConfig:
    gamma: float = 0.99
    tau: float = 0.95                 # GAE lambda (rl_games calls it tau)
    e_clip: float = 0.2
    entropy_coef: float = 0.0
    critic_coef: float = 4.0
    bounds_loss_coef: float = 0.0001
    grad_norm: float = 1.0
    horizon_length: int = 16
    minibatch_size: int = 8192
    mini_epochs: int = 8
    learning_rate: float = 3e-4
    kl_threshold: float = 0.008
    lr_schedule: str = struct.field(pytree_node=False, default="adaptive")
    clip_value: bool = struct.field(pytree_node=False, default=True)
    normalize_input: bool = struct.field(pytree_node=False, default=True)
    normalize_value: bool = struct.field(pytree_node=False, default=True)
    normalize_advantage: bool = struct.field(pytree_node=False, default=True)
    value_bootstrap: bool = struct.field(pytree_node=False, default=False)
    reward_scale: float = 1.0         # reward_shaper.scale_value
    max_epochs: int = struct.field(pytree_node=False, default=100)

    @classmethod
    def from_train_cfg(cls, train_cfg: Dict[str, Any]) -> "PPOConfig":
        c = train_cfg["params"]["config"]
        return cls(
            gamma=float(c.get("gamma", 0.99)),
            tau=float(c.get("tau", 0.95)),
            e_clip=float(c.get("e_clip", 0.2)),
            entropy_coef=float(c.get("entropy_coef", 0.0)),
            critic_coef=float(c.get("critic_coef", 4.0)),
            bounds_loss_coef=float(c.get("bounds_loss_coef", 0.0) or 0.0),
            grad_norm=float(c.get("grad_norm", 1.0)),
            horizon_length=int(c.get("horizon_length", 16)),
            minibatch_size=int(c.get("minibatch_size", 8192)),
            mini_epochs=int(c.get("mini_epochs", 8)),
            learning_rate=float(c.get("learning_rate", 3e-4)),
            kl_threshold=float(c.get("kl_threshold", 0.008)),
            lr_schedule=str(c.get("lr_schedule", "adaptive")),
            clip_value=bool(c.get("clip_value", True)),
            normalize_input=bool(c.get("normalize_input", True)),
            normalize_value=bool(c.get("normalize_value", True)),
            normalize_advantage=bool(c.get("normalize_advantage", True)),
            value_bootstrap=bool(c.get("value_bootstrap", False)),
            reward_scale=float(c.get("reward_shaper", {}).get("scale_value", 1.0)),
            max_epochs=int(c.get("max_epochs", 100)),
        )


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    obs_stats: RunningStats
    value_stats: RunningStats
    lr: jnp.ndarray
    env_state: EnvState
    last_obs: jnp.ndarray
    key: jax.Array
    epoch: jnp.ndarray
    # episode bookkeeping for metrics (host-side reporting)
    ep_return: jnp.ndarray   # (N,) running return of current episodes
    ep_length: jnp.ndarray
    mean_return: jnp.ndarray  # EMA of finished-episode returns
    mean_length: jnp.ndarray
    # asymmetric actor-critic (central value on privileged states; None when
    # the task has no states buffer or no central_value_config)
    cv_params: Any = None
    cv_opt_state: Any = None
    states_stats: Optional[RunningStats] = None
    last_states: Optional[jnp.ndarray] = None


class PPO:
    """PPO learner bound to a TaskEnv."""

    def __init__(self, env: TaskEnv, train_cfg: Dict[str, Any], axis_name: Optional[str] = None):
        # axis_name: mesh axis for data-parallel training inside shard_map
        # (gradients/statistics pmean'd over it; None = single shard)
        self.axis_name = axis_name
        self.env = env
        p = train_cfg["params"]
        net_cfg = p.get("network", {})
        mlp = net_cfg.get("mlp", {})
        space = net_cfg.get("space", {}).get("continuous", {})
        self.cfg = PPOConfig.from_train_cfg(train_cfg)
        self.network = networks.ActorCritic(
            num_actions=env.num_actions,
            units=tuple(mlp.get("units", [256, 128, 64])),
            activation=mlp.get("activation", "elu"),
            separate=bool(net_cfg.get("separate", False)),
            sigma_init=float(space.get("sigma_init", 0.0) if not isinstance(space.get("sigma_init"), dict) else space.get("sigma_init", {}).get("val", 0.0)),
            fixed_sigma=bool(space.get("fixed_sigma", True)),
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=self.cfg.learning_rate, eps=1e-8),
        )
        # asymmetric actor-critic: rl_games central_value_config (ref:
        # train.py:189-196; cfg/train/ShadowHandPPOAsymm.yaml).  Values come
        # from a privileged-state critic; the actor loss drops its value term.
        cv_cfg = p.get("config", {}).get("central_value_config")
        self.central_value = bool(cv_cfg) and getattr(env, "num_states", 0) > 0
        if self.central_value:
            cv_net = cv_cfg.get("network", {}).get("mlp", {})
            self.cv_network = networks.CentralValueNet(
                units=tuple(cv_net.get("units", [512, 256, 128])),
                activation=cv_net.get("activation", "elu"),
            )
            self.cv_mini_epochs = int(cv_cfg.get("mini_epochs", self.cfg.mini_epochs))
            self.cv_tx = optax.chain(
                optax.clip_by_global_norm(self.cfg.grad_norm),
                optax.adam(float(cv_cfg.get("learning_rate", 1e-4)), eps=1e-8),
            )
        self._num_minibatches: Optional[int] = None
        # single-device emulation of G env-shards for the distributed
        # numerical-parity harness (tests/test_parallel_parity.py): with
        # _perm_groups=G the minibatch partition matches DistributedPPO on a
        # G-device mesh exactly, so params must agree to fp tolerance
        self._perm_groups: int = 1

    @property
    def num_minibatches(self) -> int:
        # validated lazily so inference-only use (test/player path) never
        # trips the training batch-divisibility requirement
        if self._num_minibatches is None:
            n_steps = self.cfg.horizon_length * self.env.num_envs
            assert n_steps % self.cfg.minibatch_size == 0, (
                f"batch {n_steps} not divisible by minibatch {self.cfg.minibatch_size}"
            )
            self._num_minibatches = n_steps // self.cfg.minibatch_size
        return self._num_minibatches

    # ------------------------------------------------------------------
    def init(self, seed: int) -> TrainState:
        key = jax.random.PRNGKey(seed)
        key, k_env, k_net, k_cv = jax.random.split(key, 4)
        env_state = self.env.initial_state(k_env)
        obs_dict = self.env.observations(env_state)
        obs = obs_dict["obs"]
        params = self.network.init(k_net, obs[:1])
        N = self.env.num_envs
        cv_params = cv_opt = states_stats = last_states = None
        if self.central_value:
            last_states = obs_dict["states"]
            cv_params = self.cv_network.init(k_cv, last_states[:1])
            cv_opt = self.cv_tx.init(cv_params)
            states_stats = RunningStats.create((self.env.num_states,))
        return TrainState(
            cv_params=cv_params,
            cv_opt_state=cv_opt,
            states_stats=states_stats,
            last_states=last_states,
            params=params,
            opt_state=self.tx.init(params),
            obs_stats=RunningStats.create((self.env.num_obs,)),
            value_stats=RunningStats.create(()),
            lr=jnp.asarray(self.cfg.learning_rate, jnp.float32),
            env_state=env_state,
            last_obs=obs,
            key=key,
            epoch=jnp.asarray(0, jnp.int32),
            ep_return=jnp.zeros(N),
            ep_length=jnp.zeros(N),
            mean_return=jnp.zeros((), jnp.float32),
            mean_length=jnp.zeros((), jnp.float32),
        )

    # ------------------------------------------------------------------
    def _pmean(self, x):
        return jax.lax.pmean(x, self.axis_name) if self.axis_name else x

    def _policy_noise(self, k_act: jax.Array, mu: jnp.ndarray) -> jnp.ndarray:
        """Exploration noise keyed per GLOBAL env index: each env's stream is
        independent of how the batch is sharded over devices (under shard_map
        the local block is offset by axis_index), unlike a single
        `normal(k, mu.shape)` which would draw IDENTICAL noise on every shard
        of a replicated key."""
        n_loc = mu.shape[0]
        ids = jnp.arange(n_loc)
        if self.axis_name is not None:
            ids = ids + jax.lax.axis_index(self.axis_name) * n_loc
        keys = jax.vmap(jax.random.fold_in, (None, 0))(k_act, ids)
        return jax.vmap(
            lambda k: jax.random.normal(k, mu.shape[1:], mu.dtype)
        )(keys)

    def _minibatch_perm(
        self, k_perm: jax.Array, B: int, M: int, env_major: bool = False
    ) -> jnp.ndarray:
        """(M, mb) minibatch index partition of the local flat batch.

        Under shard_map each shard permutes its local samples with a key
        folded by its axis index; global minibatch k is the union of every
        shard's chunk k (equal sizes, so the pmean of shard-local gradient
        means equals the global minibatch mean exactly).  On one device with
        `_perm_groups=G` the same partition is emulated by mapping each
        group's local indices into the global flat layout — `env_major`
        selects the flat order (PPO flattens (H, N) time-major: h*N + n;
        LSTM flattens BPTT chunks env-major: n*C + c)."""
        mb = B // M
        if self.axis_name is not None:
            k_perm = jax.random.fold_in(k_perm, jax.lax.axis_index(self.axis_name))
            return jax.random.permutation(k_perm, B)[: M * mb].reshape(M, mb)
        G = self._perm_groups
        if G == 1:
            return jax.random.permutation(k_perm, B)[: M * mb].reshape(M, mb)
        Bl = B // G
        mbl = Bl // M
        N = self.env.num_envs
        Nl = N // G
        groups = []
        for g in range(G):
            p = jax.random.permutation(jax.random.fold_in(k_perm, g), Bl)
            p = p[: M * mbl].reshape(M, mbl)
            if env_major:
                p = p + g * Bl
            else:
                p = (p // Nl) * N + g * Nl + (p % Nl)
            groups.append(p)
        return jnp.concatenate(groups, axis=1)  # (M, G*mbl)

    def _norm_obs(self, stats: RunningStats, obs):
        return stats.normalize(obs) if self.cfg.normalize_input else obs

    def _extra_rollout_outputs(self, extras) -> Dict[str, jnp.ndarray]:
        """Hook: additional per-step tensors to collect (AMP obs, ...)."""
        return {}

    def _metric_rollout_outputs(self, extras) -> Dict[str, jnp.ndarray]:
        """Scalar env metrics to log per epoch: the env's extras['episode']
        per-term means + true_objective/consecutive_successes (the
        RLGPUAlgoObserver channel, ref: rlgames_utils.py:183-209)."""
        out = {}
        for k, v in extras.get("episode", {}).items():
            out[f"episode/{k}"] = jnp.asarray(v, jnp.float32)
        for k in ("true_objective", "consecutive_successes"):
            if k in extras:
                out[k] = jnp.asarray(extras[k], jnp.float32).mean()
        return out

    def _rollout(self, ts: TrainState):
        """lax.scan over horizon; returns batch dict of (H, N, ...)."""
        cfg = self.cfg

        def step_fn(carry, _):
            env_state, obs, states, key, ep_ret, ep_len, m_ret, m_len = carry
            key, k_act = jax.random.split(key)
            n_obs = self._norm_obs(ts.obs_stats, obs)
            mu, log_std, value_n = self.network.apply(ts.params, n_obs)
            if self.central_value:
                n_states = (
                    ts.states_stats.normalize(states) if cfg.normalize_input else states
                )
                value_n = self.cv_network.apply(ts.cv_params, n_states)
            action = mu + jnp.exp(log_std) * self._policy_noise(k_act, mu)
            logp = networks.gaussian_logp(mu, log_std, action)
            value = ts.value_stats.denormalize(value_n) if cfg.normalize_value else value_n

            env_state, obs_dict, rew_raw, done, extras = self.env.step(env_state, action)
            rew = rew_raw * cfg.reward_scale
            if cfg.value_bootstrap:
                # ref: common_agent.py:278-310 termination-masked bootstrap on timeout
                rew = rew + cfg.gamma * value * extras["time_outs"].astype(rew.dtype)

            # episode stats (un-shaped reward like the reference logger)
            ep_ret = ep_ret + rew_raw
            ep_len = ep_len + 1.0
            d = done.astype(jnp.float32)
            n_done = jnp.maximum(d.sum(), 1.0)
            # count-weighted EMA: one 0.99-decay PER FINISHED EPISODE, so the
            # stat matches rl_games' window-of-last-100-episodes semantics
            # (a per-step EMA misweights when many short episodes finish in
            # one step vs one long episode per many steps)
            a = jnp.power(0.99, d.sum())
            m_ret = a * m_ret + (1.0 - a) * (ep_ret * d).sum() / n_done
            m_len = a * m_len + (1.0 - a) * (ep_len * d).sum() / n_done
            ep_ret = ep_ret * (1.0 - d)
            ep_len = ep_len * (1.0 - d)

            out = dict(
                obs=obs, action=action, logp=logp, value=value, reward=rew,
                done=done, mu=mu, log_std=log_std,
            )
            if self.central_value:
                out["states"] = states
            out.update(self._extra_rollout_outputs(extras))
            metrics = self._metric_rollout_outputs(extras)
            if metrics:
                out["_env_metrics"] = metrics
            next_states = obs_dict["states"] if self.central_value else states
            return (
                env_state, obs_dict["obs"], next_states, key,
                ep_ret, ep_len, m_ret, m_len,
            ), out

        states0 = ts.last_states if self.central_value else jnp.zeros(())
        carry0 = (ts.env_state, ts.last_obs, states0, ts.key, ts.ep_return,
                  ts.ep_length, ts.mean_return, ts.mean_length)
        carry, batch = jax.lax.scan(step_fn, carry0, None, length=cfg.horizon_length)
        env_state, last_obs, last_states, key, ep_ret, ep_len, m_ret, m_len = carry
        ts = ts.replace(
            env_state=env_state, last_obs=last_obs, key=key,
            ep_return=ep_ret, ep_length=ep_len,
            mean_return=self._pmean(m_ret), mean_length=self._pmean(m_len),
        )
        if self.central_value:
            ts = ts.replace(last_states=last_states)
        return ts, batch

    def _gae(self, ts: TrainState, batch):
        cfg = self.cfg
        if self.central_value:
            n_last_s = (
                ts.states_stats.normalize(ts.last_states)
                if cfg.normalize_input else ts.last_states
            )
            v_last_n = self.cv_network.apply(ts.cv_params, n_last_s)
        else:
            n_last = self._norm_obs(ts.obs_stats, ts.last_obs)
            _, _, v_last_n = self.network.apply(ts.params, n_last)
        v_last = ts.value_stats.denormalize(v_last_n) if cfg.normalize_value else v_last_n

        def scan_fn(carry, x):
            adv_next, v_next = carry
            not_done = 1.0 - x["done"].astype(jnp.float32)
            delta = x["reward"] + cfg.gamma * v_next * not_done - x["value"]
            adv = delta + cfg.gamma * cfg.tau * not_done * adv_next
            return (adv, x["value"]), adv

        (_, _), advs = jax.lax.scan(
            scan_fn, (jnp.zeros_like(v_last), v_last), batch, reverse=True
        )
        returns = advs + batch["value"]
        return advs, returns

    def _update(self, ts: TrainState, batch, advs, returns):
        cfg = self.cfg
        # B is the LOCAL batch (horizon × local envs); under shard_map this is
        # the per-device shard and all reductions below go through _pmean.
        H, N = batch["reward"].shape[:2]
        B = H * N

        flat = {k: v.reshape((B,) + v.shape[2:]) for k, v in batch.items()}
        flat["adv"] = advs.reshape(B)
        flat["ret"] = returns.reshape(B)

        # update normalizers from this rollout (globally merged moments)
        obs_stats = (
            ts.obs_stats.update(flat["obs"], self.axis_name)
            if cfg.normalize_input
            else ts.obs_stats
        )
        value_stats = (
            ts.value_stats.update(flat["ret"], self.axis_name)
            if cfg.normalize_value
            else ts.value_stats
        )
        states_stats = ts.states_stats
        if self.central_value and cfg.normalize_input:
            states_stats = states_stats.update(flat["states"], self.axis_name)
        if cfg.normalize_advantage:
            a = flat["adv"]
            mean = self._pmean(a.mean())
            var = self._pmean(((a - mean) ** 2).mean())
            flat["adv"] = (a - mean) / (jnp.sqrt(var) + 1e-8)
        if cfg.normalize_value:
            flat["ret_n"] = value_stats.normalize(flat["ret"], clip=jnp.inf)
            flat["value_n"] = value_stats.normalize(flat["value"], clip=jnp.inf)
        else:
            flat["ret_n"] = flat["ret"]
            flat["value_n"] = flat["value"]

        def value_loss(value_n, mb):
            if cfg.clip_value:
                v_clipped = mb["value_n"] + jnp.clip(
                    value_n - mb["value_n"], -cfg.e_clip, cfg.e_clip
                )
                return jnp.maximum(
                    (value_n - mb["ret_n"]) ** 2, (v_clipped - mb["ret_n"]) ** 2
                ).mean()
            return ((value_n - mb["ret_n"]) ** 2).mean()

        def loss_fn(params, mb):
            n_obs = obs_stats.normalize(mb["obs"]) if cfg.normalize_input else mb["obs"]
            mu, log_std, value_n = self.network.apply(params, n_obs)
            logp = networks.gaussian_logp(mu, log_std, mb["action"])
            ratio = jnp.exp(logp - mb["logp"])
            surr1 = mb["adv"] * ratio
            surr2 = mb["adv"] * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
            a_loss = -jnp.minimum(surr1, surr2).mean()

            # with a central value net the actor's value head is unused
            # (ref: rl_games a2c_common has_central_value path)
            v_loss = (
                jnp.zeros(()) if self.central_value else value_loss(value_n, mb)
            )

            entropy = networks.gaussian_entropy(log_std).mean()
            # rl_games bound loss (common_agent.py:420-428): penalize |mu|>1.1
            soft = 1.1
            b_loss = (
                jnp.clip(mu - soft, 0.0, None) ** 2 + jnp.clip(mu + soft, None, 0.0) ** 2
            ).sum(-1).mean()

            loss = (
                a_loss
                + 0.5 * cfg.critic_coef * v_loss
                - cfg.entropy_coef * entropy
                + cfg.bounds_loss_coef * b_loss
            )
            kl = networks.gaussian_kl(mb["mu"], mb["log_std"], mu, log_std).mean()
            return loss, dict(a_loss=a_loss, v_loss=v_loss, entropy=entropy, kl=kl)

        def minibatch_step(carry, mb_idx):
            params, opt_state, lr, key = carry
            mb = jax.tree.map(lambda v: v[mb_idx], flat)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)
            # data-parallel gradient reduction over the env mesh axis
            # (the NCCL all-reduce equivalent, SURVEY.md §5.8)
            grads = self._pmean(grads)
            aux = self._pmean(aux)
            loss = self._pmean(loss)
            opt_state[1].hyperparams["learning_rate"] = lr  # optax inject_hyperparams pattern
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # adaptive KL LR (rl_games AdaptiveScheduler, common_agent.py:216-236)
            if cfg.lr_schedule == "adaptive":
                lr = jnp.where(aux["kl"] > 2.0 * cfg.kl_threshold, lr / 1.5, lr)
                lr = jnp.where(aux["kl"] < 0.5 * cfg.kl_threshold, lr * 1.5, lr)
                lr = jnp.clip(lr, 1e-6, 1e-2)
            return (params, opt_state, lr, key), (loss, aux["kl"], aux["a_loss"], aux["v_loss"], aux["entropy"])

        mb_size = B // self.num_minibatches  # local minibatch under sharding

        def epoch_step(carry, _):
            params, opt_state, lr, key = carry
            key, k_perm = jax.random.split(key)
            perm = self._minibatch_perm(k_perm, B, self.num_minibatches)
            (params, opt_state, lr, key), metrics = jax.lax.scan(
                minibatch_step, (params, opt_state, lr, key), perm
            )
            return (params, opt_state, lr, key), metrics

        (params, opt_state, lr, key), metrics = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state, ts.lr, ts.key), None,
            length=cfg.mini_epochs,
        )
        loss, kl, a_loss, v_loss, entropy = metrics
        ts = ts.replace(
            params=params, opt_state=opt_state, lr=lr, key=key,
            obs_stats=obs_stats, value_stats=value_stats,
            epoch=ts.epoch + 1,
        )

        if self.central_value:
            # separate privileged-state critic update with its own optimizer
            # and mini-epoch count (rl_games CentralValueTrain.train_net)
            def cv_loss_fn(cv_params, mb):
                n_s = (
                    states_stats.normalize(mb["states"])
                    if cfg.normalize_input else mb["states"]
                )
                value_n = self.cv_network.apply(cv_params, n_s)
                return value_loss(value_n, mb)

            def cv_minibatch_step(carry, mb_idx):
                cv_params, cv_opt = carry
                mb = jax.tree.map(lambda v: v[mb_idx], flat)
                vl, grads = jax.value_and_grad(cv_loss_fn)(cv_params, mb)
                grads = self._pmean(grads)
                updates, cv_opt = self.cv_tx.update(grads, cv_opt, cv_params)
                cv_params = optax.apply_updates(cv_params, updates)
                return (cv_params, cv_opt), vl

            def cv_epoch_step(carry, k_perm):
                perm = self._minibatch_perm(k_perm, B, self.num_minibatches)
                return jax.lax.scan(cv_minibatch_step, carry, perm)

            key, k_cv = jax.random.split(ts.key)
            (cv_params, cv_opt), cv_losses = jax.lax.scan(
                cv_epoch_step, (ts.cv_params, ts.cv_opt_state),
                jax.random.split(k_cv, self.cv_mini_epochs),
            )
            v_loss = cv_losses
            ts = ts.replace(
                cv_params=cv_params, cv_opt_state=cv_opt,
                states_stats=states_stats, key=key,
            )
        info = dict(
            loss=loss.mean(), kl=kl.mean(), a_loss=a_loss.mean(),
            v_loss=v_loss.mean(), entropy=entropy.mean(), lr=lr,
            mean_return=ts.mean_return, mean_length=ts.mean_length,
        )
        return ts, info

    # ------------------------------------------------------------------
    # The epoch is TWO jit programs, not one: the rollout program contains
    # the fused Pallas physics kernel and compiles like the pure-env bench;
    # folding the minibatch-SGD scans into the same program makes the
    # combined XLA+Mosaic compile pathologically slow through the remote
    # TPU compile relay.  The host roundtrip between them is one dispatch
    # per epoch (~98k env-steps) — noise.
    @partial(jax.jit, static_argnums=0)
    def _rollout_gae_jit(self, ts: TrainState):
        ts, batch = self._rollout(ts)
        env_metrics = batch.pop("_env_metrics", None)
        advs, returns = self._gae(ts, batch)
        return ts, batch, advs, returns, env_metrics

    @partial(jax.jit, static_argnums=0)
    def _update_jit(self, ts: TrainState, batch, advs, returns):
        return self._update(ts, batch, advs, returns)

    def train_epoch(self, ts: TrainState):
        """One full PPO epoch: rollout + GAE + mini-epoch updates."""
        ts, batch, advs, returns, env_metrics = self._rollout_gae_jit(ts)
        ts, info = self._update_jit(ts, batch, advs, returns)
        if env_metrics is not None:
            info.update({k: v.mean() for k, v in env_metrics.items()})
        return ts, info

    # ------------------------------------------------------------------
    def train(
        self,
        seed: int = 42,
        max_epochs: Optional[int] = None,
        log_every: int = 10,
        callback=None,
        init_ts: Optional[TrainState] = None,
    ) -> TrainState:
        ts = init_ts if init_ts is not None else self.init(seed)
        epochs = max_epochs or self.cfg.max_epochs
        steps_per_epoch = self.cfg.horizon_length * self.env.num_envs
        t_win = time.time()
        ep_win = 0
        for ep in range(epochs):
            ts, info = self.train_epoch(ts)
            if callback is not None:
                callback(ep, ts, info)
            if log_every and (ep % log_every == 0 or ep == epochs - 1):
                jax.block_until_ready(info["loss"])
                # windowed fps (since last print): the steady-state rate,
                # not a cumulative average polluted by compile time
                # (matches the reference's per-epoch fps_total,
                # ref: learning/common_agent.py:144-150)
                now = time.time()
                fps = steps_per_epoch * (ep + 1 - ep_win) / max(now - t_win, 1e-9)
                t_win, ep_win = now, ep + 1
                print(
                    f"epoch {ep:5d} | return {float(info['mean_return']):9.2f} "
                    f"| len {float(info['mean_length']):6.1f} | kl {float(info['kl']):.4f} "
                    f"| lr {float(info['lr']):.2e} | fps_total {fps:,.0f}"
                )
        return ts

    # ------------------------------------------------------------------
    def act(self, ts: TrainState, obs: jnp.ndarray, deterministic: bool = True,
            key: Optional[jax.Array] = None):
        """Inference policy (player path, ref: learning/common_player.py:54).
        deterministic=False samples from the gaussian (requires key)."""
        n_obs = self._norm_obs(ts.obs_stats, obs)
        mu, log_std, _ = self.network.apply(ts.params, n_obs)
        if deterministic or key is None:
            return mu
        return mu + jnp.exp(log_std) * jax.random.normal(key, mu.shape)
