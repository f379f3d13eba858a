"""Running mean/std normalizers (rl_games RunningMeanStd equivalents).

Used for `normalize_input` (obs) and `normalize_value` (value targets)
(ref: cfg/train/*PPO.yaml config flags; rl_games running_mean_std.py
semantics: Welford-style parallel update, clamped normalized output).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStats:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def create(cls, shape):
        return cls(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(1e-4, jnp.float32),
        )

    def update(self, batch: jnp.ndarray, axis_name: str | None = None) -> "RunningStats":
        """batch: (B, *shape) — parallel variance merge.

        With `axis_name` (inside shard_map), moments are averaged across the
        mesh axis so every shard holds identical global statistics.
        """
        import jax

        b_mean = jnp.mean(batch, axis=0)
        b_var = jnp.var(batch, axis=0)
        b_count = jnp.asarray(batch.shape[0], jnp.float32)
        if axis_name is not None:
            g_mean = jax.lax.pmean(b_mean, axis_name)
            b_var = jax.lax.pmean(b_var + b_mean**2, axis_name) - g_mean**2
            b_mean = g_mean
            b_count = b_count * jax.lax.psum(1, axis_name)
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta**2 * self.count * b_count / tot
        return RunningStats(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jnp.ndarray, clip: float = 5.0) -> jnp.ndarray:
        y = (x - self.mean) / jnp.sqrt(self.var + 1e-5)
        return jnp.clip(y, -clip, clip)

    def denormalize(self, y: jnp.ndarray) -> jnp.ndarray:
        return y * jnp.sqrt(self.var + 1e-5) + self.mean
