"""Automatic Domain Randomization — tensorized, device-resident.

Behavioral port of the reference's ADRVecTask (ref:
tasks/dextreme/adr_vec_task.py:489-1250, implementing OpenAI's ADR,
arXiv:1910.07113 alg. 1):

- every env is a worker: ADR_ROLLOUT samples each randomization parameter
  uniformly inside the current [lo, hi] range; ADR_BOUNDARY pins ONE
  parameter (its `adr_mode`) at the range's lower (mode 2n) or upper
  (mode 2n+1) edge; workers are re-drawn on episode end (ref
  recycle_envs :744-760).
- per-boundary performance queues: when a boundary's queue fills, its mean
  objective moves that range edge outward (mean > threshold_high), inward
  (mean < threshold_low), or leaves it (ref adr_update :762-920); the queue
  then clears and its boundary workers are demoted to rollout.

TPU-native differences (documented):
- queues are fixed-size running (sum, count) accumulators rather than
  deques — the decision uses the same mean-over-last-K statistic.
- the whole update is a pure function over an `ADRState` pytree; it runs
  inside the jitted env step (no host bookkeeping, unlike the reference's
  python deques + .cpu() round-trips).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

ROLLOUT, BOUNDARY, EVAL = 0, 1, 2


@struct.dataclass
class ADRState:
    worker_types: jnp.ndarray  # (N,) int32
    adr_modes: jnp.ndarray     # (N,) int32 in [0, 2P)
    ranges: jnp.ndarray        # (P, 2)
    queue_sum: jnp.ndarray     # (2P,)
    queue_count: jnp.ndarray   # (2P,) int32
    values: jnp.ndarray        # (N, P) current per-env parameter values
    npd: jnp.ndarray           # (,) scalar "nats per dimension" entropy measure


class ADR:
    def __init__(self, adr_cfg: Dict[str, Any], num_envs: int):
        self.num_envs = num_envs
        self.boundary_fraction = float(adr_cfg.get("worker_adr_boundary_fraction", 0.4))
        self.queue_len = int(adr_cfg.get("adr_queue_threshold_length", 256))
        self.th_low = float(adr_cfg.get("adr_objective_threshold_low", 5.0))
        self.th_high = float(adr_cfg.get("adr_objective_threshold_high", 20.0))
        params = adr_cfg.get("params", {})
        self.names: List[str] = list(params.keys())
        self.P = len(self.names)
        init, limits, deltas, mult = [], [], [], []
        for n in self.names:
            p = params[n]
            init.append([float(v) for v in p["init_range"]])
            lim = p.get("limits", [None, None])
            limits.append(
                [
                    -np.inf if lim[0] is None else float(lim[0]),
                    np.inf if lim[1] is None else float(lim[1]),
                ]
            )
            deltas.append(float(p.get("delta", 0.02)))
            mult.append(p.get("delta_style", "additive") == "multiplicative")
        self.init_range = jnp.array(init)          # (P, 2)
        self.limits = jnp.array(limits)            # (P, 2)
        self.delta = jnp.array(deltas)             # (P,)
        self.multiplicative = jnp.array(mult)      # (P,) bool

    def param_index(self, name: str) -> int:
        return self.names.index(name)

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array) -> ADRState:
        n = self.num_envs
        st = ADRState(
            worker_types=jnp.zeros(n, jnp.int32),
            adr_modes=jnp.zeros(n, jnp.int32),
            ranges=self.init_range,
            queue_sum=jnp.zeros(2 * self.P),
            queue_count=jnp.zeros(2 * self.P, jnp.int32),
            values=jnp.zeros((n, self.P)),
            npd=jnp.zeros(()),
        )
        st = self.recycle(key, st, jnp.ones(n, bool))
        return st.replace(
            values=self.sample(jax.random.fold_in(key, 1), st, jnp.ones(n, bool), st.values)
        )

    def recycle(self, key: jax.Array, st: ADRState, mask: jnp.ndarray) -> ADRState:
        """Reassign worker types/modes for envs in mask (ref :744-760)."""
        k1, k2 = jax.random.split(key)
        r = jax.random.uniform(k1, (self.num_envs,))
        new_types = jnp.where(r < self.boundary_fraction, ROLLOUT, BOUNDARY).astype(jnp.int32)
        new_modes = jax.random.randint(k2, (self.num_envs,), 0, 2 * self.P)
        return st.replace(
            worker_types=jnp.where(mask, new_types, st.worker_types),
            adr_modes=jnp.where(mask, new_modes, st.adr_modes).astype(jnp.int32),
        )

    def sample(self, key: jax.Array, st: ADRState, mask: jnp.ndarray, prev: jnp.ndarray) -> jnp.ndarray:
        """(N, P) parameter values: rollout workers uniform in range;
        boundary workers pinned at their mode's edge (ref sample_adr_tensor)."""
        lo, hi = st.ranges[:, 0], st.ranges[:, 1]
        u = jax.random.uniform(key, (self.num_envs, self.P))
        vals = lo + u * (hi - lo)
        param_of_mode = st.adr_modes // 2
        bound_of_mode = st.adr_modes % 2  # 0 lower, 1 upper
        pinned_val = jnp.where(bound_of_mode == 0, lo[param_of_mode], hi[param_of_mode])
        is_boundary = st.worker_types == BOUNDARY
        onehot = jax.nn.one_hot(param_of_mode, self.P, dtype=bool)
        vals = jnp.where(
            is_boundary[:, None] & onehot, pinned_val[:, None], vals
        )
        return jnp.where(mask[:, None], vals, prev)

    def update(self, st: ADRState, done: jnp.ndarray, objective: jnp.ndarray) -> ADRState:
        """Push finished boundary episodes' objectives into their queues and
        move range edges for full queues (ref adr_update :762-920)."""
        is_boundary = (st.worker_types == BOUNDARY) & done
        # scatter-add objectives into per-(param, bound) accumulators
        qsum = st.queue_sum.at[st.adr_modes].add(jnp.where(is_boundary, objective, 0.0))
        qcnt = st.queue_count.at[st.adr_modes].add(jnp.where(is_boundary, 1, 0))

        full = qcnt >= self.queue_len
        mean = qsum / jnp.maximum(qcnt, 1)
        low_q = full[0::2]
        high_q = full[1::2]
        mean_low = mean[0::2]
        mean_high = mean[1::2]

        lo, hi = st.ranges[:, 0], st.ranges[:, 1]

        def step_up(x):
            return jnp.where(self.multiplicative, x * self.delta, x + self.delta)

        def step_down(x):
            return jnp.where(self.multiplicative, x / self.delta, x - self.delta)

        # lower bound: poor perf -> shrink (raise lo toward init), good perf
        # -> expand (lower lo toward limit)
        lo_new = jnp.where(
            low_q & (mean_low < self.th_low),
            jnp.minimum(step_up(lo), self.init_range[:, 0]),
            lo,
        )
        lo_new = jnp.where(
            low_q & (mean_low > self.th_high),
            jnp.maximum(step_down(lo), self.limits[:, 0]),
            lo_new,
        )
        hi_new = jnp.where(
            high_q & (mean_high < self.th_low),
            jnp.maximum(step_down(hi), self.init_range[:, 1]),
            hi,
        )
        hi_new = jnp.where(
            high_q & (mean_high > self.th_high),
            jnp.minimum(step_up(hi), self.limits[:, 1]),
            hi_new,
        )
        ranges = jnp.stack([lo_new, hi_new], axis=-1)

        # clear consumed queues
        clear = jnp.stack([low_q, high_q], -1).reshape(-1)
        qsum = jnp.where(clear, 0.0, qsum)
        qcnt = jnp.where(clear, 0, qcnt)

        # demote boundary workers whose queue was consumed
        consumed = clear[st.adr_modes] & (st.worker_types == BOUNDARY)
        worker_types = jnp.where(consumed, ROLLOUT, st.worker_types)

        # ADR entropy: mean log range width (nats per dimension, ref :905-917)
        width = jnp.maximum(ranges[:, 1] - ranges[:, 0], 1e-9)
        npd = jnp.mean(jnp.log(width / jnp.maximum(self.init_range[:, 1] - self.init_range[:, 0], 1e-9)))
        return st.replace(
            worker_types=worker_types, ranges=ranges,
            queue_sum=qsum, queue_count=qcnt, npd=npd,
        )

    def on_reset(self, key: jax.Array, st: ADRState, done: jnp.ndarray, objective: jnp.ndarray) -> ADRState:
        """Full per-step ADR flow on episode boundaries: queue update, range
        adaptation, worker recycling, fresh parameter sampling."""
        st = self.update(st, done, objective)
        k1, k2 = jax.random.split(key)
        st = self.recycle(k1, st, done)
        return st.replace(values=self.sample(k2, st, done, st.values))
