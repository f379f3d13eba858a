"""AMP: Adversarial Motion Priors on top of the on-device PPO.

Replaces the reference's AMPAgent (ref: learning/amp_continuous.py):
- rollout additionally records extras["amp_obs"]; style reward
  -log(max(1 - sigmoid(D), 1e-4)) * disc_reward_scale is combined with the
  task reward w_task*r + w_disc*r_disc (ref :488-512).
- discriminator (MLP, units from network.disc) trained each epoch on
  [policy + replay] vs demo transitions with BCE + logit-weight reg +
  gradient penalty on demo inputs + weight decay (ref: _disc_loss :393-431).
- device-resident ring replay of agent amp obs (ref: _store_replay_amp_obs
  :514-523; the keep-prob thinning becomes uniform ring overwrite).
- demo transitions are sampled fresh from the device-resident MotionLib
  every epoch — the reference's demo buffer only amortizes host-side motion
  sampling, which is free here (documented deviation).
- the discriminator uses its own Adam at the policy LR instead of sharing
  the policy optimizer (functionally equivalent; documented deviation).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from isaacgymenv_tpu.learning.ppo import PPO, TrainState
from isaacgymenv_tpu.learning.running_stats import RunningStats


class Discriminator(nn.Module):
    units: tuple = (1024, 512)
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation, nn.relu)
        for u in self.units:
            x = act(nn.Dense(u)(x))
        return nn.Dense(1, name="logit")(x)[..., 0]


@struct.dataclass
class AMPTrainState(TrainState):
    disc_params: Any = None
    disc_opt: Any = None
    amp_stats: RunningStats = None
    replay: jnp.ndarray = None        # (cap, D) agent amp obs ring
    replay_count: jnp.ndarray = None  # scalar int32


class AMPPPO(PPO):
    def __init__(self, env, train_cfg: Dict[str, Any], axis_name: Optional[str] = None):
        super().__init__(env, train_cfg, axis_name=axis_name)
        p = train_cfg["params"]
        c = p["config"]
        disc_cfg = p.get("network", {}).get("disc", {})
        self.disc = Discriminator(
            units=tuple(disc_cfg.get("units", [1024, 512])),
            activation=disc_cfg.get("activation", "relu"),
        )
        self.task_reward_w = float(c.get("task_reward_w", 0.0))
        self.disc_reward_w = float(c.get("disc_reward_w", 1.0))
        self.disc_reward_scale = float(c.get("disc_reward_scale", 2.0))
        self.disc_coef = float(c.get("disc_coef", 5.0))
        self.disc_logit_reg = float(c.get("disc_logit_reg", 0.05))
        self.disc_grad_penalty = float(c.get("disc_grad_penalty", 5.0))
        self.disc_weight_decay = float(c.get("disc_weight_decay", 0.0001))
        self.amp_batch_size = int(c.get("amp_batch_size", 512))
        self.amp_minibatch_size = int(c.get("amp_minibatch_size", 4096))
        self.replay_size = int(c.get("amp_replay_buffer_size", 200000))
        self.normalize_amp = bool(c.get("normalize_amp_input", True))
        self.disc_tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.grad_norm),
            optax.adam(self.cfg.learning_rate, eps=1e-8),
        )
        self.amp_dim = env.num_amp_obs

    # ------------------------------------------------------------------
    def _extra_rollout_outputs(self, extras):
        return {"amp_obs": extras["amp_obs"]}

    def init(self, seed: int) -> AMPTrainState:
        import dataclasses

        base = super().init(seed)
        k_disc = jax.random.fold_in(base.key, 99)
        disc_params = self.disc.init(k_disc, jnp.zeros((1, self.amp_dim)))
        base_fields = {
            f.name: getattr(base, f.name) for f in dataclasses.fields(TrainState)
        }
        return AMPTrainState(
            **base_fields,
            disc_params=disc_params,
            disc_opt=self.disc_tx.init(disc_params),
            amp_stats=RunningStats.create((self.amp_dim,)),
            replay=jnp.zeros((self.replay_size, self.amp_dim)),
            replay_count=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------
    def _norm_amp(self, stats, x):
        return stats.normalize(x) if self.normalize_amp else x

    def _disc_reward(self, ts: AMPTrainState, amp_obs):
        """ref: _calc_disc_rewards (amp_continuous.py:505-512)."""
        logits = self.disc.apply(ts.disc_params, self._norm_amp(ts.amp_stats, amp_obs))
        prob = jax.nn.sigmoid(logits)
        return -jnp.log(jnp.maximum(1.0 - prob, 1e-4)) * self.disc_reward_scale

    def _disc_loss_fn(self, disc_params, agent_obs, demo_obs):
        """BCE + logit reg + grad penalty + weight decay (ref :393-431)."""
        agent_logit = self.disc.apply(disc_params, agent_obs)
        demo_logit = self.disc.apply(disc_params, demo_obs)
        loss_agent = optax.sigmoid_binary_cross_entropy(
            agent_logit, jnp.zeros_like(agent_logit)
        ).mean()
        loss_demo = optax.sigmoid_binary_cross_entropy(
            demo_logit, jnp.ones_like(demo_logit)
        ).mean()
        loss = 0.5 * (loss_agent + loss_demo)

        logit_w = disc_params["params"]["logit"]["kernel"]
        loss += self.disc_logit_reg * jnp.sum(jnp.square(logit_w))

        grad = jax.grad(
            lambda o: self.disc.apply(disc_params, o).sum()
        )(demo_obs)
        gp = jnp.sum(jnp.square(grad), axis=-1).mean()
        loss += self.disc_grad_penalty * gp

        if self.disc_weight_decay:
            sq = sum(
                jnp.sum(jnp.square(w))
                for path, w in jax.tree_util.tree_flatten_with_path(disc_params)[0]
                if any(getattr(k, "key", "") == "kernel" for k in path)
            )
            loss += self.disc_weight_decay * sq

        acc_agent = (agent_logit < 0).astype(jnp.float32).mean()
        acc_demo = (demo_logit > 0).astype(jnp.float32).mean()
        return loss, dict(disc_gp=gp, disc_agent_acc=acc_agent, disc_demo_acc=acc_demo)

    # ------------------------------------------------------------------
    # rollout and update are SEPARATE jit programs (same reason as
    # PPO.train_epoch: the fused Pallas physics kernel plus the SGD scans
    # in one program compiles pathologically slowly via the remote relay)
    @partial(jax.jit, static_argnums=0)
    def _amp_rollout_jit(self, ts: AMPTrainState):
        ts, batch = self._rollout(ts)
        env_metrics = batch.pop("_env_metrics", None)
        return ts, batch, env_metrics

    def train_epoch(self, ts: AMPTrainState):
        ts, batch, env_metrics = self._amp_rollout_jit(ts)
        ts, info = self._amp_update_jit(ts, batch)
        if env_metrics is not None:
            info.update({k: v.mean() for k, v in env_metrics.items()})
        return ts, info

    @partial(jax.jit, static_argnums=0)
    def _amp_update_jit(self, ts: AMPTrainState, batch):
        return self._amp_update(ts, batch)

    def _amp_update(self, ts: AMPTrainState, batch):
        H, N = batch["reward"].shape
        B = H * N
        amp_flat = batch["amp_obs"].reshape(B, self.amp_dim)

        # combined reward (ref: amp_continuous.py:488-493)
        disc_r = self._disc_reward(ts, amp_flat).reshape(H, N)
        batch["reward"] = (
            self.task_reward_w * batch["reward"] + self.disc_reward_w * disc_r
        )

        advs, returns = self._gae(ts, batch)
        amp_obs_saved = batch.pop("amp_obs")
        ts, info = self._update(ts, batch, advs, returns)

        # ---- discriminator update ----
        key = ts.key
        key, k_demo, k_replay, k_mb = jax.random.split(key, 4)
        if self.axis_name is not None:
            # decorrelate demo/replay/minibatch sampling across shards (the
            # carried key stays replicated; see parallel/trainer.py)
            idx_ax = jax.lax.axis_index(self.axis_name)
            k_demo = jax.random.fold_in(k_demo, idx_ax)
            k_replay = jax.random.fold_in(k_replay, idx_ax)
            k_mb = jax.random.fold_in(k_mb, idx_ax)
        amp_stats = (
            ts.amp_stats.update(amp_flat, self.axis_name)
            if self.normalize_amp
            else ts.amp_stats
        )
        n_mb = max(B // self.amp_minibatch_size, 1)
        mb = min(self.amp_minibatch_size, B)
        # ring capacity from the runtime shape: under shard_map the replay is
        # sharded over the env axis, so the local ring is cap/n_shards rows
        cap = ts.replay.shape[0]
        demo = self.env.fetch_amp_obs_demo(k_demo, n_mb * mb)
        replay_idx = jax.random.randint(
            k_replay, (n_mb * mb,), 0, jnp.maximum(ts.replay_count, 1)
        )
        have_replay = ts.replay_count > 0
        replay_obs = jnp.where(
            have_replay, ts.replay[replay_idx % cap], amp_flat[replay_idx % B]
        )
        perm = jax.random.permutation(k_mb, B)[: n_mb * mb]

        def disc_step(carry, idx):
            disc_params, disc_opt = carry
            i0 = idx
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i0 * mb, mb, 0)
            agent = jnp.concatenate(
                [
                    self._norm_amp(amp_stats, amp_flat[jax.lax.dynamic_slice_in_dim(perm, i0 * mb, mb, 0)]),
                    self._norm_amp(amp_stats, sl(replay_obs)),
                ],
                axis=0,
            )
            demo_n = self._norm_amp(amp_stats, sl(demo))
            (loss, aux), grads = jax.value_and_grad(self._disc_loss_fn, has_aux=True)(
                disc_params, agent, demo_n
            )
            grads = self._pmean(grads)
            updates, disc_opt = self.disc_tx.update(grads, disc_opt, disc_params)
            disc_params = optax.apply_updates(disc_params, updates)
            return (disc_params, disc_opt), (loss, aux["disc_agent_acc"], aux["disc_demo_acc"])

        (disc_params, disc_opt), (d_loss, acc_a, acc_d) = jax.lax.scan(
            disc_step, (ts.disc_params, ts.disc_opt), jnp.arange(n_mb)
        )

        # ---- store rollout amp obs into the ring replay ----
        start = ts.replay_count % cap
        idx = (start + jnp.arange(B)) % cap
        replay = ts.replay.at[idx].set(amp_flat)
        ts = ts.replace(
            disc_params=disc_params,
            disc_opt=disc_opt,
            amp_stats=amp_stats,
            replay=replay,
            replay_count=ts.replay_count + B,
            key=key,
        )
        info = dict(
            info,
            disc_loss=d_loss.mean(),
            disc_agent_acc=acc_a.mean(),
            disc_demo_acc=acc_d.mean(),
            disc_reward=disc_r.mean(),
        )
        return ts, info
