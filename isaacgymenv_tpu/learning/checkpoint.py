"""Checkpoint save/restore of the full training state.

Reference parity (SURVEY.md §5.4): policy weights + optimizer + running
normalizers + RNG + env/curriculum state are all in `TrainState`, so a
single pytree serialization round-trips everything the reference splits
across .pth files and `get_env_state/set_env_state` hooks
(vec_task.py:196-204).

Format: a versioned container around the host pytree.  On load the
model-defining leaves (params/optimizer/normalizer shapes) are validated
against the agent's abstract init (`jax.eval_shape` — zero compute) so a
checkpoint from a differently-configured network fails AT THE BOUNDARY
with a clear message instead of deep inside jax (ref: the reference
validates implicitly via torch load_state_dict strict=True).
Env-batch-sized fields (env_state, last_obs, replay, ...) are exempt so a
policy trained at 4096 envs can be loaded for a 16-env test run the same
way the reference reuses .pth weights across num_envs.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np

_FORMAT = "isaacgymenv_tpu.ckpt"
_VERSION = 1

# fields whose shapes scale with num_envs / replay capacity / time — not
# model-defining, skipped by validation (they still load if shapes match)
_ENV_SIZED_FIELDS = frozenset({
    "env_state", "last_obs", "last_states", "key", "epoch",
    "ep_return", "ep_length", "mean_return", "mean_length",
    "replay", "replay_count", "ptr", "size", "rnn_state",
})


# bulky non-model fields (replay rings scale with capacity x obs dim —
# hundreds of MB) dropped from slim checkpoints: a best-by-reward snapshot
# is for evaluation/deployment, and pulling the full ring through a remote
# device tunnel on EVERY improving epoch collapsed training throughput
_SLIM_DROP_FIELDS = frozenset({"replay", "env_state"})


def save_train_state(ts, path: str, slim: bool = False) -> None:
    if slim:
        drop = {
            f: None for f in _SLIM_DROP_FIELDS
            if getattr(ts, f, None) is not None
        }
        if drop:
            ts = ts.replace(**drop)
    # one batched transfer (per-leaf np.asarray pays a device round-trip
    # per leaf — ruinous through a remote device tunnel)
    if jax.process_count() > 1:
        # multi-process (jax.distributed): env-sharded leaves span
        # non-addressable devices and cannot be fetched directly —
        # allgather them so every rank saves the same GLOBAL state
        # (the torchrun-equivalent path; ranks write distinct
        # experiment dirs, see train.py multi-host entry)
        from jax.experimental import multihost_utils

        def fetch(x):
            if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
                return np.asarray(multihost_utils.process_allgather(x, tiled=True))
            return x

        ts = jax.tree.map(fetch, ts)
    host = jax.device_get(ts)
    payload = {
        "format": _FORMAT,
        "version": _VERSION,
        "state_cls": type(ts).__name__,
        "state": host,
        "slim": slim,
    }
    # atomic write: PBT peers read checkpoints from the shared workspace
    # concurrently — a direct write would expose partial pickles
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    import os

    os.replace(tmp, path)


def refill_slim(agent, ts, seed: int = 0):
    """Refill fields dropped by a slim save before resuming TRAINING.

    Slim (best-by-reward) checkpoints drop the replay ring and live env
    state; a fresh `agent.init(seed)` provides replacements (empty ring,
    re-reset envs) while the loaded params/optimizer/normalizers are kept.
    No-op for full checkpoints.
    """
    missing = [
        f for f in _SLIM_DROP_FIELDS
        if hasattr(ts, f) and getattr(ts, f) is None
    ]
    if not missing:
        return ts
    fresh = agent.init(seed)
    return ts.replace(**{f: getattr(fresh, f) for f in missing})


def _validate_against(agent, ts) -> None:
    """Compare model-defining leaf shapes vs the agent's abstract init."""
    import dataclasses

    try:
        template = jax.eval_shape(agent.init, 0)
    except Exception:
        return  # agent.init not abstractly traceable; skip validation
    if not dataclasses.is_dataclass(ts) or not dataclasses.is_dataclass(template):
        return
    t_fields = {f.name for f in dataclasses.fields(template)}
    for f in dataclasses.fields(ts):
        if f.name in _ENV_SIZED_FIELDS or f.name not in t_fields:
            continue
        got = getattr(ts, f.name)
        want = getattr(template, f.name)
        if got is None or want is None:
            if (got is None) != (want is None):
                raise ValueError(
                    f"checkpoint field '{f.name}' is "
                    f"{'missing' if got is None else 'present'} but the "
                    f"agent expects the opposite — the checkpoint was saved "
                    f"by a differently-configured agent"
                )
            continue
        if jax.tree.structure(got) != jax.tree.structure(want):
            raise ValueError(
                f"checkpoint field '{f.name}' has a different pytree "
                f"structure than this agent's (network layout mismatch — "
                f"check the train config the checkpoint was saved with)"
            )
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            if tuple(np.shape(g)) != tuple(w.shape):
                raise ValueError(
                    f"checkpoint field '{f.name}' leaf shape {np.shape(g)} != "
                    f"expected {tuple(w.shape)} — network/config mismatch "
                    f"between the checkpoint and this agent"
                )


def load_train_state(agent, path: str, validate: bool = True):
    """Load a TrainState pytree; validate model shapes against `agent`.

    Accepts both the versioned container and legacy raw-pickle states.
    Pass agent=None (or validate=False) to skip validation.
    """
    import jax.numpy as jnp

    with open(path, "rb") as f:
        host = pickle.load(f)
    if isinstance(host, dict) and host.get("format") == _FORMAT:
        if host["version"] > _VERSION:
            raise ValueError(
                f"checkpoint {path} has format version {host['version']} > "
                f"supported {_VERSION} — upgrade the framework to load it"
            )
        host = host["state"]
    ts = jax.tree.map(jnp.asarray, host)
    if validate and agent is not None:
        _validate_against(agent, ts)
    return ts
