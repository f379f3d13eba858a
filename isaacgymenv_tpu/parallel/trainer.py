"""Distributed PPO: the single-chip learner wrapped in shard_map.

`DistributedPPO.train_epoch` runs the exact same math as `PPO.train_epoch`
but with the env batch sharded over the mesh's ``env`` axis: rollouts and
minibatch assembly are shard-local (zero communication), gradients and
normalizer statistics are pmean'd (see learning/ppo.py `_pmean` hooks).

This replaces the reference's per-GPU process + torch.distributed all-reduce
(ref: utils/rlgames_utils.py:89-107, SURVEY.md §5.8) with one SPMD program.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from isaacgymenv_tpu.envs.base import TaskEnv
from isaacgymenv_tpu.learning.ppo import PPO, TrainState
from isaacgymenv_tpu.parallel import mesh as mesh_mod

AXIS = "env"


class DistributedPPO(PPO):
    """PPO with the env axis sharded over a jax Mesh."""

    def __init__(self, env: TaskEnv, train_cfg: Dict[str, Any], mesh: Mesh):
        super().__init__(env, train_cfg, axis_name=AXIS)
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        assert env.num_envs % self.n_shards == 0, (
            f"num_envs {env.num_envs} must divide over {self.n_shards} devices"
        )
        self._dist_epoch = None

    def init(self, seed: int) -> TrainState:
        ts = super().init(seed)
        specs = self._specs(ts)
        return jax.tree.map(
            lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, s)),
            ts,
            specs,
        )

    def _specs(self, ts: TrainState):
        """Structural PartitionSpecs: env-batched state sharded over AXIS,
        learner state replicated.  Built by field, not by shape heuristics
        (a shape[0]==num_envs test misfires when a parameter dim equals the
        env count)."""
        shard = P(AXIS)
        repl = P()

        def env_state_specs(es):
            return es.replace(
                sim=jax.tree.map(lambda _: shard, es.sim),
                progress=shard,
                reset=shard,
                rng=repl,
                ts={k: jax.tree.map(lambda _: shard, v) for k, v in es.ts.items()},
            )

        return ts.replace(
            params=jax.tree.map(lambda _: repl, ts.params),
            opt_state=jax.tree.map(lambda _: repl, ts.opt_state),
            obs_stats=jax.tree.map(lambda _: repl, ts.obs_stats),
            value_stats=jax.tree.map(lambda _: repl, ts.value_stats),
            lr=repl,
            env_state=env_state_specs(ts.env_state),
            last_obs=shard,
            key=repl,
            epoch=repl,
            ep_return=shard,
            ep_length=shard,
            mean_return=repl,
            mean_length=repl,
        )

    def train_epoch(self, ts: TrainState):
        if self._dist_epoch is None:
            in_specs = self._specs(ts)

            def body(ts_local: TrainState):
                # decorrelate per-shard sampling; keep the stored key replicated
                idx = jax.lax.axis_index(AXIS)
                orig_key = ts_local.key
                ts_l = ts_local.replace(key=jax.random.fold_in(orig_key, idx + 1))
                ts_l, batch = self._rollout(ts_l)
                advs, returns = self._gae(ts_l, batch)
                ts_l, info = self._update(ts_l, batch, advs, returns)
                # replicated-out key: advance deterministically from the original
                ts_l = ts_l.replace(key=jax.random.split(orig_key)[0])
                return ts_l, info

            # output specs: same sharding layout as input + replicated info
            def run(ts_in):
                dummy_info = {
                    k: P()
                    for k in ("loss", "kl", "a_loss", "v_loss", "entropy", "lr",
                              "mean_return", "mean_length")
                }
                return shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(in_specs,),
                    out_specs=(in_specs, dummy_info),
                    check_vma=False,
                )(ts_in)

            self._dist_epoch = jax.jit(run)
        return self._dist_epoch(ts)
