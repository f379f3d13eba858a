"""Device mesh + env-axis sharding utilities.

The parallelism model (SURVEY.md §2.2 "Parallelism" + §5.8):
- one mesh axis ``env``: the batch of environments is sharded across chips;
  env stepping needs NO cross-chip communication (envs are independent),
- the learner is data-parallel: parameters/optimizer replicated, gradients
  and statistics pmean'd over ``env`` (rides ICI within a slice, DCN across
  slices — XLA chooses the collectives),
- TP/PP/SP are deliberately absent, like the reference: policy MLPs are tiny
  (SURVEY.md §2.2: "do not build").

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
same code then spans all hosts' devices (the torchrun+NCCL equivalent,
ref: README.md:165-172).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch_pytree(tree, mesh: Mesh, num_envs: int, axis: str = "env"):
    """device_put each leaf: env-batched leaves sharded on dim 0, rest replicated."""

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == num_envs:
            spec = P(axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def batch_specs(tree, num_envs: int, axis: str = "env"):
    """PartitionSpec pytree: env-batched leaves -> P(axis), others -> P()."""

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            return P(axis)
        return P()

    return jax.tree.map(spec, tree)
