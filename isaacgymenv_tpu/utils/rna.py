"""Random Network Adversary — random action perturbations for DeXtreme.

Port of the reference's RandomNetworkAdversary (ref: utils/rna_util.py:37-163):
a fixed randomly-initialized MLP (never trained) maps (dof_pos, object_pose)
to BINNED actions (argmax over softmax bins per channel — OpenAI found
continuous+tanh RNA outputs collapse to 0, arXiv:1910.07113 B.3); per-env
dropout masks emulate a different random network per env without N copies.
The final action is alpha * rna_action + (1 - alpha) * policy_action.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class RandomNetworkAdversary:
    def __init__(self, key: jax.Array, num_envs: int, in_dims: int, out_dims: int,
                 softmax_bins: int = 32):
        self.num_envs = num_envs
        self.in_dims = in_dims
        self.out_dims = out_dims
        self.bins = softmax_bins
        f1, f2 = 512, 1024
        ks = jax.random.split(key, 8)

        def kaiming(k, fan_in, shape):
            bound = jnp.sqrt(6.0 / fan_in)
            return jax.random.uniform(k, shape, minval=-bound, maxval=bound)

        self.w1 = kaiming(ks[0], in_dims, (in_dims, f1))
        self.w1_1 = kaiming(ks[1], f1, (f1, f1))
        self.w2 = kaiming(ks[2], f1, (f1, f2))
        self.w2_1 = kaiming(ks[3], f2, (f2, f2))
        self.w3 = kaiming(ks[4], f2, (f2, out_dims * softmax_bins))
        p1 = jax.random.uniform(ks[5], ())
        p2 = jax.random.uniform(ks[6], ())
        self.mask1 = jax.random.bernoulli(ks[7], p1, (num_envs, f1)).astype(jnp.float32)
        self.mask2 = jax.random.bernoulli(
            jax.random.fold_in(ks[7], 1), p2, (num_envs, f2)
        ).astype(jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, in_dims) -> (N, out_dims) binned random actions in [-1, 1]."""
        h = jax.nn.relu(x @ self.w1)
        h = h * self.mask1
        h = jax.nn.relu(h @ self.w1_1)
        h = jax.nn.relu(h @ self.w2)
        h = h * self.mask2
        h = jax.nn.relu(h @ self.w2_1)
        logits = (h @ self.w3).reshape(x.shape[0], self.out_dims, self.bins)
        bin_idx = jnp.argmax(logits, axis=-1)
        return 2.0 * bin_idx.astype(jnp.float32) / (self.bins - 1) - 1.0
