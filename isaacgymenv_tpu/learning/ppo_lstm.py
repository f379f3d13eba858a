"""PPO with an LSTM policy (truncated BPTT), fully on-device.

Covers the reference's rl_games RNN path (ref: common_agent.py:186-208
play_steps_rnn + seq_len minibatching; cfg/train/AnymalTerrainPPO_LSTM.yaml,
ShadowHandOpenAI_LSTMPPO.yaml):
- the rollout carries the LSTM state; it is zeroed for envs that reset
  (ref: rl_games zeroes RNN states on done);
- the horizon is split into seq_len chunks; each (chunk, env) pair is a
  BPTT sample initialized from the hidden state recorded at the chunk
  start; minibatch SGD samples over those sequences and unrolls the policy
  with lax.scan inside the loss.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from isaacgymenv_tpu.learning import networks
from isaacgymenv_tpu.learning.ppo import PPO, TrainState
from isaacgymenv_tpu.learning.running_stats import RunningStats


@struct.dataclass
class LSTMTrainState(TrainState):
    rnn_state: Any = None     # (h, c) each (N, hidden)
    cv_rnn_state: Any = None  # recurrent central value carry (None if FF cv)


class LSTMPPO(PPO):
    def __init__(self, env, train_cfg: Dict[str, Any], axis_name: Optional[str] = None):
        super().__init__(env, train_cfg, axis_name=axis_name)
        p = train_cfg["params"]
        net_cfg = p.get("network", {})
        rnn = net_cfg.get("rnn", {})
        mlp = net_cfg.get("mlp", {})
        space = net_cfg.get("space", {}).get("continuous", {})
        self.seq_len = int(p["config"].get("seq_len", p["config"].get("seq_length", 4)))
        assert self.cfg.horizon_length % self.seq_len == 0
        self.network = networks.ActorCriticLSTM(
            num_actions=env.num_actions,
            units=tuple(mlp.get("units", [256, 128, 64])),
            activation=mlp.get("activation", "elu"),
            lstm_units=int(rnn.get("units", 128)),
            sigma_init=float(space.get("sigma_init", 0.0) if not isinstance(space.get("sigma_init"), dict) else 0.0),
            fixed_sigma=bool(space.get("fixed_sigma", True)),
            before_mlp=bool(rnn.get("before_mlp", False)),
            concat_input=bool(rnn.get("concat_input", False)),
            layer_norm=bool(rnn.get("layer_norm", False)),
        )
        # recurrent central value (rl_games central_value_config.network.rnn;
        # the DexPBT/asymm-LSTM configs pair an LSTM policy with an LSTM
        # privileged critic — ref cfg/train/AllegroKukaLSTMPPO.yaml)
        cv_cfg = p.get("config", {}).get("central_value_config") or {}
        cv_rnn = cv_cfg.get("network", {}).get("rnn")
        self.cv_is_rnn = bool(self.central_value and cv_rnn)
        if self.cv_is_rnn:
            cv_mlp = cv_cfg.get("network", {}).get("mlp", {})
            self.cv_network = networks.CentralValueLSTM(
                units=tuple(cv_mlp.get("units", [512, 256, 128])),
                activation=cv_mlp.get("activation", "elu"),
                lstm_units=int(cv_rnn.get("units", 512)),
                before_mlp=bool(cv_rnn.get("before_mlp", True)),
                concat_input=bool(cv_rnn.get("concat_input", False)),
                layer_norm=bool(cv_rnn.get("layer_norm", False)),
            )

    def _cv_value(self, ts, n_states, carry):
        """Central value apply, recurrent or FF; returns (value, carry')."""
        if self.cv_is_rnn:
            return self.cv_network.apply(ts.cv_params, n_states, carry)
        return self.cv_network.apply(ts.cv_params, n_states), carry

    # ------------------------------------------------------------------
    def init(self, seed: int) -> LSTMTrainState:
        import dataclasses

        key = jax.random.PRNGKey(seed)
        key, k_env, k_net = jax.random.split(key, 3)
        env_state = self.env.initial_state(k_env)
        obs = self.env.observations(env_state)["obs"]
        N = self.env.num_envs
        carry0 = self.network.initial_carry(1)
        params = self.network.init(k_net, obs[:1], carry0)
        base = TrainState(
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
        fields = {f.name: getattr(base, f.name) for f in dataclasses.fields(TrainState)}
        cv_rnn_state = None
        if self.central_value:
            key, k_cv = jax.random.split(key)
            last_states = self.env.observations(env_state)["states"]
            if self.cv_is_rnn:
                cv_params = self.cv_network.init(
                    k_cv, last_states[:1], self.cv_network.initial_carry(1)
                )
                cv_rnn_state = self.cv_network.initial_carry(N)
            else:
                cv_params = self.cv_network.init(k_cv, last_states[:1])
            fields.update(
                key=key,
                last_states=last_states,
                cv_params=cv_params,
                states_stats=RunningStats.create((self.env.num_states,)),
            )
            fields["cv_opt_state"] = self.cv_tx.init(fields["cv_params"])
        return LSTMTrainState(
            **fields, rnn_state=self.network.initial_carry(N),
            cv_rnn_state=cv_rnn_state,
        )

    # ------------------------------------------------------------------
    def _rollout(self, ts: LSTMTrainState):
        cfg = self.cfg

        def step_fn(carry, _):
            (env_state, obs, states, rnn, cv_rnn, key,
             ep_ret, ep_len, m_ret, m_len) = carry
            key, k_act = jax.random.split(key)
            n_obs = self._norm_obs(ts.obs_stats, obs)
            mu, log_std, value_n, rnn_next = self.network.apply(ts.params, n_obs, rnn)
            cv_rnn_next = cv_rnn
            if self.central_value:
                n_states = (
                    ts.states_stats.normalize(states) if cfg.normalize_input else states
                )
                value_n, cv_rnn_next = self._cv_value(ts, n_states, cv_rnn)
            action = mu + jnp.exp(log_std) * self._policy_noise(k_act, mu)
            logp = networks.gaussian_logp(mu, log_std, action)
            value = ts.value_stats.denormalize(value_n) if cfg.normalize_value else value_n

            env_state, obs_dict, rew_raw, done, extras = self.env.step(env_state, action)
            rew = rew_raw * cfg.reward_scale
            if cfg.value_bootstrap:
                rew = rew + cfg.gamma * value * extras["time_outs"].astype(rew.dtype)

            ep_ret = ep_ret + rew_raw
            ep_len = ep_len + 1.0
            d = done.astype(jnp.float32)
            n_done = jnp.maximum(d.sum(), 1.0)
            # count-weighted EMA (one decay per finished episode; see ppo.py)
            a = jnp.power(0.99, d.sum())
            m_ret = a * m_ret + (1.0 - a) * (ep_ret * d).sum() / n_done
            m_len = a * m_len + (1.0 - a) * (ep_len * d).sum() / n_done
            ep_ret = ep_ret * (1.0 - d)
            ep_len = ep_len * (1.0 - d)

            out = dict(
                obs=obs, action=action, logp=logp, value=value, reward=rew,
                done=done, mu=mu, log_std=log_std,
                rnn_h=rnn[0], rnn_c=rnn[1],
            )
            if self.central_value:
                out["states"] = states
            if self.cv_is_rnn:
                out["cv_h"], out["cv_c"] = cv_rnn[0], cv_rnn[1]
            # zero hidden state for envs that were reset (rl_games semantics)
            nd = (1.0 - d)[:, None]
            rnn_next = (rnn_next[0] * nd, rnn_next[1] * nd)
            if self.cv_is_rnn:
                cv_rnn_next = (cv_rnn_next[0] * nd, cv_rnn_next[1] * nd)
            next_states = obs_dict["states"] if self.central_value else states
            return (env_state, obs_dict["obs"], next_states, rnn_next,
                    cv_rnn_next, key, ep_ret, ep_len, m_ret, m_len), out

        states0 = ts.last_states if self.central_value else jnp.zeros(())
        cv_rnn0 = ts.cv_rnn_state if self.cv_is_rnn else jnp.zeros(())
        carry0 = (ts.env_state, ts.last_obs, states0, ts.rnn_state, cv_rnn0,
                  ts.key, ts.ep_return, ts.ep_length, ts.mean_return,
                  ts.mean_length)
        carry, batch = jax.lax.scan(step_fn, carry0, None, length=cfg.horizon_length)
        (env_state, last_obs, last_states, rnn, cv_rnn, key,
         ep_ret, ep_len, m_ret, m_len) = carry
        ts = ts.replace(
            env_state=env_state, last_obs=last_obs, rnn_state=rnn, key=key,
            ep_return=ep_ret, ep_length=ep_len,
            mean_return=self._pmean(m_ret), mean_length=self._pmean(m_len),
        )
        if self.central_value:
            ts = ts.replace(last_states=last_states)
        if self.cv_is_rnn:
            ts = ts.replace(cv_rnn_state=cv_rnn)
        return ts, batch

    def _gae(self, ts: LSTMTrainState, batch):
        cfg = self.cfg
        if self.central_value:
            n_last_s = (
                ts.states_stats.normalize(ts.last_states)
                if cfg.normalize_input else ts.last_states
            )
            v_last_n, _ = self._cv_value(
                ts, n_last_s, ts.cv_rnn_state if self.cv_is_rnn else None
            )
        else:
            n_last = self._norm_obs(ts.obs_stats, ts.last_obs)
            _, _, v_last_n, _ = self.network.apply(ts.params, n_last, ts.rnn_state)
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

    # ------------------------------------------------------------------
    def _update(self, ts: LSTMTrainState, batch, advs, returns):
        cfg = self.cfg
        H, N = batch["reward"].shape[:2]
        S = self.seq_len
        C = H // S  # chunks per env
        B = C * N   # BPTT samples

        def to_seq(v):
            # (H, N, ...) -> (B, S, ...): chunk the horizon
            v = v.reshape((C, S, N) + v.shape[2:])
            return jnp.moveaxis(v, 2, 0).reshape((B, S) + v.shape[3:])

        flat = {
            k: to_seq(v) for k, v in batch.items()
            if k not in ("rnn_h", "rnn_c", "states", "cv_h", "cv_c")
        }
        flat["adv"] = to_seq(advs)
        flat["ret"] = to_seq(returns)
        # initial hidden state of each chunk
        h0 = batch["rnn_h"].reshape(C, S, N, -1)[:, 0]
        c0 = batch["rnn_c"].reshape(C, S, N, -1)[:, 0]
        flat["h0"] = jnp.moveaxis(h0, 1, 0).reshape(B, -1)
        flat["c0"] = jnp.moveaxis(c0, 1, 0).reshape(B, -1)

        obs_stats = (
            ts.obs_stats.update(batch["obs"].reshape((H * N, -1)), self.axis_name)
            if cfg.normalize_input else ts.obs_stats
        )
        value_stats = (
            ts.value_stats.update(returns.reshape(-1), self.axis_name)
            if cfg.normalize_value else ts.value_stats
        )
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

        def loss_fn(params, mb):
            n_obs = obs_stats.normalize(mb["obs"]) if cfg.normalize_input else mb["obs"]

            def cell(carry, x):
                mu, log_std, v, carry = self.network.apply(params, x, carry)
                return carry, (mu, log_std, v)

            # unroll over the sequence axis (mb arrays are (mb, S, ...))
            _, (mu, log_std, value_n) = jax.lax.scan(
                cell, (mb["h0"], mb["c0"]), jnp.moveaxis(n_obs, 1, 0)
            )
            mu = jnp.moveaxis(mu, 0, 1)
            log_std = jnp.moveaxis(log_std, 0, 1)
            value_n = jnp.moveaxis(value_n, 0, 1)

            logp = networks.gaussian_logp(mu, log_std, mb["action"])
            ratio = jnp.exp(logp - mb["logp"])
            surr1 = mb["adv"] * ratio
            surr2 = mb["adv"] * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
            a_loss = -jnp.minimum(surr1, surr2).mean()
            if self.central_value:
                # privileged-state critic is trained separately below
                v_loss = jnp.zeros(())
            elif cfg.clip_value:
                v_clipped = mb["value_n"] + jnp.clip(
                    value_n - mb["value_n"], -cfg.e_clip, cfg.e_clip
                )
                v_loss = jnp.maximum(
                    (value_n - mb["ret_n"]) ** 2, (v_clipped - mb["ret_n"]) ** 2
                ).mean()
            else:
                v_loss = ((value_n - mb["ret_n"]) ** 2).mean()
            entropy = networks.gaussian_entropy(log_std).mean()
            soft = 1.1
            b_loss = (
                jnp.clip(mu - soft, 0.0, None) ** 2 + jnp.clip(mu + soft, None, 0.0) ** 2
            ).sum(-1).mean()
            loss = (
                a_loss + 0.5 * cfg.critic_coef * v_loss
                - cfg.entropy_coef * entropy + cfg.bounds_loss_coef * b_loss
            )
            kl = networks.gaussian_kl(mb["mu"], mb["log_std"], mu, log_std).mean()
            return loss, dict(a_loss=a_loss, v_loss=v_loss, entropy=entropy, kl=kl)

        n_minibatches = max(B * S // self.cfg.minibatch_size, 1)
        mb_size = B // n_minibatches

        def minibatch_step(carry, mb_idx):
            params, opt_state, lr, key = carry
            mb = jax.tree.map(lambda v: v[mb_idx], flat)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)
            grads = self._pmean(grads)
            aux = self._pmean(aux)
            opt_state[1].hyperparams["learning_rate"] = lr
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if cfg.lr_schedule == "adaptive":
                lr = jnp.where(aux["kl"] > 2.0 * cfg.kl_threshold, lr / 1.5, lr)
                lr = jnp.where(aux["kl"] < 0.5 * cfg.kl_threshold, lr * 1.5, lr)
                lr = jnp.clip(lr, 1e-6, 1e-2)
            return (params, opt_state, lr, key), (loss, aux["kl"], aux["a_loss"], aux["v_loss"], aux["entropy"])

        def epoch_step(carry, _):
            params, opt_state, lr, key = carry
            key, k_perm = jax.random.split(key)
            # BPTT samples are env-major (n*C + c) — see _minibatch_perm
            perm = self._minibatch_perm(k_perm, B, n_minibatches, env_major=True)
            return jax.lax.scan(minibatch_step, (params, opt_state, lr, key), perm)

        (params, opt_state, lr, key), metrics = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state, ts.lr, ts.key), None,
            length=cfg.mini_epochs,
        )
        loss, kl, a_loss, v_loss, entropy = metrics
        ts = ts.replace(
            params=params, opt_state=opt_state, lr=lr, key=key,
            obs_stats=obs_stats, value_stats=value_stats, epoch=ts.epoch + 1,
        )

        if self.central_value and self.cv_is_rnn:
            # recurrent privileged critic: truncated-BPTT update over the
            # same seq_len chunks as the policy (rl_games central value with
            # an rnn block trains on sequences with stored initial states)
            states_sq = to_seq(batch["states"])           # (B, S, ns)
            ret_sq = to_seq(returns)                      # (B, S)
            val_sq = to_seq(batch["value"])
            cvh0 = batch["cv_h"].reshape(C, S, N, -1)[:, 0]
            cvc0 = batch["cv_c"].reshape(C, S, N, -1)[:, 0]
            cvh0 = jnp.moveaxis(cvh0, 1, 0).reshape(B, -1)
            cvc0 = jnp.moveaxis(cvc0, 1, 0).reshape(B, -1)
            states_stats = ts.states_stats
            if cfg.normalize_input:
                states_stats = states_stats.update(
                    batch["states"].reshape((H * N, -1)), self.axis_name
                )
            if cfg.normalize_value:
                ret_nq = value_stats.normalize(ret_sq, clip=jnp.inf)
                val_nq = value_stats.normalize(val_sq, clip=jnp.inf)
            else:
                ret_nq, val_nq = ret_sq, val_sq

            def cv_loss_fn(cv_params, mb_s, mb_h0, mb_c0, mb_ret, mb_val):
                n_s = (
                    states_stats.normalize(mb_s) if cfg.normalize_input else mb_s
                )

                def cell(carry, x):
                    v, carry = self.cv_network.apply(cv_params, x, carry)
                    return carry, v

                _, value_n = jax.lax.scan(
                    cell, (mb_h0, mb_c0), jnp.moveaxis(n_s, 1, 0)
                )
                value_n = jnp.moveaxis(value_n, 0, 1)
                if cfg.clip_value:
                    v_clipped = mb_val + jnp.clip(
                        value_n - mb_val, -cfg.e_clip, cfg.e_clip
                    )
                    return jnp.maximum(
                        (value_n - mb_ret) ** 2, (v_clipped - mb_ret) ** 2
                    ).mean()
                return ((value_n - mb_ret) ** 2).mean()

            n_cv_mb = max(B * S // self.cfg.minibatch_size, 1)

            def cv_minibatch_step(carry, mb_idx):
                cv_params, cv_opt = carry
                vl, grads = jax.value_and_grad(cv_loss_fn)(
                    cv_params, states_sq[mb_idx], cvh0[mb_idx], cvc0[mb_idx],
                    ret_nq[mb_idx], val_nq[mb_idx],
                )
                grads = self._pmean(grads)
                updates, cv_opt = self.cv_tx.update(grads, cv_opt, cv_params)
                cv_params = optax.apply_updates(cv_params, updates)
                return (cv_params, cv_opt), vl

            def cv_epoch_step(carry, k_perm):
                perm = self._minibatch_perm(k_perm, B, n_cv_mb, env_major=True)
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
        elif self.central_value:
            # privileged-state critic update on the flat (H*N) batch (same
            # shape as the feedforward PPO central-value path)
            states_f = batch["states"].reshape((H * N, -1))
            ret_f = returns.reshape(H * N)
            val_f = batch["value"].reshape(H * N)
            states_stats = ts.states_stats
            if cfg.normalize_input:
                states_stats = states_stats.update(states_f, self.axis_name)
            if cfg.normalize_value:
                ret_fn = value_stats.normalize(ret_f, clip=jnp.inf)
                val_fn = value_stats.normalize(val_f, clip=jnp.inf)
            else:
                ret_fn, val_fn = ret_f, val_f

            def cv_loss_fn(cv_params, mb_s, mb_ret, mb_val):
                n_s = (
                    states_stats.normalize(mb_s) if cfg.normalize_input else mb_s
                )
                value_n = self.cv_network.apply(cv_params, n_s)
                if cfg.clip_value:
                    v_clipped = mb_val + jnp.clip(
                        value_n - mb_val, -cfg.e_clip, cfg.e_clip
                    )
                    return jnp.maximum(
                        (value_n - mb_ret) ** 2, (v_clipped - mb_ret) ** 2
                    ).mean()
                return ((value_n - mb_ret) ** 2).mean()

            BF = H * N
            n_cv_mb = max(BF // self.cfg.minibatch_size, 1)
            cv_mb = BF // n_cv_mb

            def cv_minibatch_step(carry, mb_idx):
                cv_params, cv_opt = carry
                vl, grads = jax.value_and_grad(cv_loss_fn)(
                    cv_params, states_f[mb_idx], ret_fn[mb_idx], val_fn[mb_idx]
                )
                grads = self._pmean(grads)
                updates, cv_opt = self.cv_tx.update(grads, cv_opt, cv_params)
                cv_params = optax.apply_updates(cv_params, updates)
                return (cv_params, cv_opt), vl

            def cv_epoch_step(carry, k_perm):
                perm = self._minibatch_perm(k_perm, BF, n_cv_mb)
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
    def act(self, ts: LSTMTrainState, obs: jnp.ndarray, deterministic: bool = True,
            key=None):
        n_obs = self._norm_obs(ts.obs_stats, obs)
        mu, _, _, rnn = self.network.apply(ts.params, n_obs, ts.rnn_state)
        # NOTE: stateful inference should thread rnn via act_with_state
        return mu

    def act_with_state(self, ts: LSTMTrainState, obs: jnp.ndarray, rnn,
                       deterministic: bool = True, key=None):
        n_obs = self._norm_obs(ts.obs_stats, obs)
        mu, log_std, _, rnn = self.network.apply(ts.params, n_obs, rnn)
        if deterministic or key is None:
            return mu, rnn
        return mu + jnp.exp(log_std) * jax.random.normal(key, mu.shape), rnn
