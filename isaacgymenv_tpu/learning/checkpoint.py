"""Checkpoint save/restore of the full training state.

Reference parity (SURVEY.md §5.4): policy weights + optimizer + running
normalizers + RNG + env/curriculum state are all in `TrainState`, so a
single pytree serialization round-trips everything the reference splits
across .pth files and `get_env_state/set_env_state` hooks
(vec_task.py:196-204).
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def save_train_state(ts, path: str) -> None:
    host = jax.tree.map(lambda x: np.asarray(x), ts)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_train_state(agent, path: str):
    with open(path, "rb") as f:
        host = pickle.load(f)
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, host)
