"""Distributed learners: the single-chip agents wrapped in shard_map.

`Distributed{PPO,LSTMPPO,AMPPPO,SAC}.train_epoch` runs the exact same math
as the single-device agents but with the env batch sharded over the mesh's
``env`` axis: rollouts and minibatch assembly are shard-local (zero
communication), gradients and normalizer statistics are pmean'd (see
learning/ppo.py `_pmean` hooks; RunningStats.update merges moments).

This replaces the reference's per-GPU process + torch.distributed all-reduce
(ref: utils/rlgames_utils.py:89-107, SURVEY.md §5.8) with one SPMD program.

Numerical contract (tests/test_parallel_parity.py): given the same rollout
batch, the 8-shard update produces the same parameters as the single-device
update with `_perm_groups=8` — the minibatch partition, normalizer-moment
merge, advantage normalization, and gradient reduction are all
shard-count-invariant by construction.  Rollout RNG follows the reference's
per-rank seeding instead (env rng folded by shard index; utils.py:94
seed+rank) — exploration noise is already shard-invariant via per-global-env
keys (PPO._policy_noise).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from isaacgymenv_tpu.envs.base import TaskEnv
from isaacgymenv_tpu.learning.amp import AMPPPO
from isaacgymenv_tpu.learning.ppo import PPO, TrainState
from isaacgymenv_tpu.learning.ppo_lstm import LSTMPPO
from isaacgymenv_tpu.learning.sac import SAC

AXIS = "env"


def _env_state_specs(es, shard, repl):
    return es.replace(
        sim=jax.tree.map(lambda _: shard, es.sim),
        progress=shard,
        reset=shard,
        rng=repl,
        ts={k: jax.tree.map(lambda _: shard, v) for k, v in es.ts.items()},
    )


class _DistributedMixin:
    """Shared shard_map plumbing over the single-device epoch math.

    Subclasses define `_specs(ts)` (PartitionSpec pytree matching the train
    state) and `_epoch_local(ts) -> (ts, info)` (the per-shard epoch body).
    """

    def _bind_mesh(self, mesh: Mesh):
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        assert self.env.num_envs % self.n_shards == 0, (
            f"num_envs {self.env.num_envs} must divide over {self.n_shards} devices"
        )
        self._dist_epoch = None

    def init(self, seed: int):
        return self.shard_state(super().init(seed))

    def shard_state(self, ts):
        """device_put a (possibly host-loaded) train state with this mesh's
        layout — used for fresh inits AND checkpoint resumes."""
        specs = self._specs(ts)
        return jax.tree.map(
            lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, s)),
            ts,
            specs,
        )

    def _epoch_body(self, ts):
        # per-shard env RNG stream (the reference seeds per rank,
        # utils/utils.py:94): fold the replicated key by the shard index for
        # the local rollout, then advance the carried key deterministically
        # so it stays replicated
        idx = jax.lax.axis_index(AXIS)
        orig_rng = ts.env_state.rng
        ts_l = ts.replace(
            env_state=ts.env_state.replace(rng=jax.random.fold_in(orig_rng, idx))
        )
        ts_l, info = self._epoch_local(ts_l)
        ts_l = ts_l.replace(
            env_state=ts_l.env_state.replace(rng=jax.random.split(orig_rng)[0])
        )
        # scalars: pmean makes every entry bitwise-replicated (most already are)
        info = jax.tree.map(lambda x: jax.lax.pmean(x, AXIS), info)
        return ts_l, info

    def train_epoch(self, ts):
        if self._dist_epoch is None:
            in_specs = self._specs(ts)
            info_spec = jax.tree.map(
                lambda _: P(), jax.eval_shape(self._epoch_body_shape, ts)[1]
            )

            def run(ts_in):
                return shard_map(
                    self._epoch_body,
                    mesh=self.mesh,
                    in_specs=(in_specs,),
                    out_specs=(in_specs, info_spec),
                    check_vma=False,
                )(ts_in)

            self._dist_epoch = jax.jit(run)
        return self._dist_epoch(ts)

    def _epoch_body_shape(self, ts):
        """Abstract stand-in for out-structure discovery: runs the epoch body
        on the GLOBAL batch under eval_shape (no compute, no collectives —
        axis calls are monkeypatched out by using the single-device path)."""
        saved, self.axis_name = self.axis_name, None
        try:
            return self._epoch_local(ts)
        finally:
            self.axis_name = saved


class DistributedPPO(_DistributedMixin, PPO):
    """PPO with the env axis sharded over a jax Mesh."""

    def __init__(self, env: TaskEnv, train_cfg: Dict[str, Any], mesh: Mesh):
        super().__init__(env, train_cfg, axis_name=AXIS)
        self._bind_mesh(mesh)

    def _specs(self, ts: TrainState):
        """Structural PartitionSpecs: env-batched state sharded over AXIS,
        learner state replicated.  Built by field, not by shape heuristics
        (a shape[0]==num_envs test misfires when a parameter dim equals the
        env count)."""
        shard, repl = P(AXIS), P()
        return ts.replace(
            params=jax.tree.map(lambda _: repl, ts.params),
            opt_state=jax.tree.map(lambda _: repl, ts.opt_state),
            obs_stats=jax.tree.map(lambda _: repl, ts.obs_stats),
            value_stats=jax.tree.map(lambda _: repl, ts.value_stats),
            lr=repl,
            env_state=_env_state_specs(ts.env_state, shard, repl),
            last_obs=shard,
            key=repl,
            epoch=repl,
            ep_return=shard,
            ep_length=shard,
            mean_return=repl,
            mean_length=repl,
            cv_params=jax.tree.map(lambda _: repl, ts.cv_params),
            cv_opt_state=jax.tree.map(lambda _: repl, ts.cv_opt_state),
            states_stats=jax.tree.map(lambda _: repl, ts.states_stats),
            last_states=None if ts.last_states is None else shard,
        )

    def _epoch_local(self, ts: TrainState):
        ts, batch = self._rollout(ts)
        env_metrics = batch.pop("_env_metrics", None)
        advs, returns = self._gae(ts, batch)
        ts, info = self._update(ts, batch, advs, returns)
        if env_metrics is not None:
            info.update({k: v.mean() for k, v in env_metrics.items()})
        return ts, info


class DistributedLSTMPPO(_DistributedMixin, LSTMPPO):
    """LSTM-PPO sharded over the env axis (rnn hidden state is per-env)."""

    def __init__(self, env: TaskEnv, train_cfg: Dict[str, Any], mesh: Mesh):
        super().__init__(env, train_cfg, axis_name=AXIS)
        self._bind_mesh(mesh)

    def _specs(self, ts):
        shard = P(AXIS)
        base = DistributedPPO._specs(self, ts)
        return base.replace(rnn_state=jax.tree.map(lambda _: shard, ts.rnn_state))

    _epoch_local = DistributedPPO._epoch_local


class DistributedAMPPPO(_DistributedMixin, AMPPPO):
    """AMP sharded over the env axis; the amp-obs replay ring is sharded
    (each shard keeps cap/n rows of its own rollouts — the per-rank replay
    layout of the reference's multi-GPU path)."""

    def __init__(self, env: TaskEnv, train_cfg: Dict[str, Any], mesh: Mesh):
        super().__init__(env, train_cfg, axis_name=AXIS)
        self._bind_mesh(mesh)
        assert self.replay_size % self.n_shards == 0

    def _specs(self, ts):
        shard, repl = P(AXIS), P()
        base = DistributedPPO._specs(self, ts)
        return base.replace(
            disc_params=jax.tree.map(lambda _: repl, ts.disc_params),
            disc_opt=jax.tree.map(lambda _: repl, ts.disc_opt),
            amp_stats=jax.tree.map(lambda _: repl, ts.amp_stats),
            replay=shard,
            replay_count=repl,
        )

    def _epoch_local(self, ts):
        ts, batch = self._rollout(ts)
        env_metrics = batch.pop("_env_metrics", None)
        ts, info = self._amp_update(ts, batch)
        if env_metrics is not None:
            info.update({k: v.mean() for k, v in env_metrics.items()})
        return ts, info


class DistributedSAC(_DistributedMixin, SAC):
    """SAC sharded over the env axis; the transition replay ring is sharded
    (each shard samples update minibatches from its local rows)."""

    def __init__(self, env: TaskEnv, train_cfg: Dict[str, Any], mesh: Mesh):
        super().__init__(env, train_cfg, axis_name=AXIS)
        self._bind_mesh(mesh)
        assert self.capacity % self.n_shards == 0

    def _specs(self, ts):
        shard, repl = P(AXIS), P()
        return ts.replace(
            actor=jax.tree.map(lambda _: repl, ts.actor),
            critic=jax.tree.map(lambda _: repl, ts.critic),
            critic_target=jax.tree.map(lambda _: repl, ts.critic_target),
            log_alpha=repl,
            opt_actor=jax.tree.map(lambda _: repl, ts.opt_actor),
            opt_critic=jax.tree.map(lambda _: repl, ts.opt_critic),
            opt_alpha=jax.tree.map(lambda _: repl, ts.opt_alpha),
            obs_stats=jax.tree.map(lambda _: repl, ts.obs_stats),
            replay=jax.tree.map(lambda _: shard, ts.replay),
            ptr=repl,
            size=repl,
            env_state=_env_state_specs(ts.env_state, shard, repl),
            last_obs=shard,
            key=repl,
            epoch=repl,
            ep_return=shard,
            ep_length=shard,
            mean_return=repl,
            mean_length=repl,
        )

    def _epoch_local(self, ts):
        ts = self._collect(ts)
        return self._update_epoch(ts)
