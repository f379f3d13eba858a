"""Determinism CI + checkpoint/resume roundtrip (SURVEY §5.2/§5.4).

The reference only documents reproducibility caveats
(docs/reproducibility.md); here fixed-seed bitwise reproducibility is a
testable property because the whole step is a pure function.
"""

import os
import numpy as np
import jax
import jax.numpy as jnp


def _rollout(task="Ant", seed=7, steps=20, n=8):
    from isaacgymenv_tpu.api import make

    env = make(seed=seed, task=task, num_envs=n)
    env.reset()
    state = env.state
    key = jax.random.PRNGKey(123)
    traj = []
    step = jax.jit(env.task.step)
    for _ in range(steps):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (n, env.num_actions), minval=-1, maxval=1)
        state, obs, rew, done, ex = step(state, a)
        traj.append(np.asarray(obs["obs"]))
    return np.stack(traj)


def test_fixed_seed_bitwise_reproducible():
    t1 = _rollout()
    t2 = _rollout()
    assert np.array_equal(t1, t2), "fixed-seed trajectories must match bitwise"


def test_checkpoint_roundtrip_resumes_training(tmp_path):
    from isaacgymenv_tpu.envs.registry import get_task
    from isaacgymenv_tpu.learning.checkpoint import load_train_state, save_train_state
    from isaacgymenv_tpu.learning.ppo import PPO
    from isaacgymenv_tpu.utils.config import load_task_config, load_train_config

    cfg = load_task_config("Cartpole", num_envs=16)
    env = get_task("Cartpole")(cfg)
    tc = load_train_config("Cartpole")
    tc["params"]["config"].update({"minibatch_size": 128, "horizon_length": 8, "mini_epochs": 2})
    agent = PPO(env, tc)
    ts = agent.init(0)
    for _ in range(2):
        ts, _ = agent.train_epoch(ts)

    path = str(tmp_path / "ckpt.ckpt")
    save_train_state(ts, path)
    ts2 = load_train_state(agent, path)

    # identical params and normalizer state
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert int(ts2.epoch) == int(ts.epoch)
    # resumed training continues without error and changes params
    ts3, info = agent.train_epoch(ts2)
    assert np.isfinite(float(info["loss"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts2.params), jax.tree.leaves(ts3.params))
    )
    assert changed


def test_slim_checkpoint_roundtrip(tmp_path):
    """Slim (best-by-reward) saves drop bulky replay/env-state fields; loading
    one and refilling resumes training (train.py's checkpoint= path)."""
    from isaacgymenv_tpu.envs.registry import get_task
    from isaacgymenv_tpu.learning.checkpoint import (
        load_train_state,
        refill_slim,
        save_train_state,
    )
    from isaacgymenv_tpu.learning.sac import SAC
    from isaacgymenv_tpu.utils.config import load_task_config, load_train_config

    cfg = load_task_config("Cartpole", num_envs=8)
    env = get_task("Cartpole")(cfg)
    tc = load_train_config("Cartpole", name="AntSAC")
    tc["params"]["config"].update(
        {"replay_buffer_size": 262144, "batch_size": 64, "num_warmup_steps": 4}
    )
    agent = SAC(env, tc)
    ts = agent.init(0)
    ts, _ = agent.train_epoch(ts)

    full, slim = str(tmp_path / "full.ckpt"), str(tmp_path / "slim.ckpt")
    save_train_state(ts, full)
    save_train_state(ts, slim, slim=True)
    # the point of slim: the replay ring (capacity x obs) dominates the file
    assert os.path.getsize(slim) < os.path.getsize(full) / 2

    ts2 = load_train_state(agent, slim)
    assert ts2.replay is None
    for a, b in zip(jax.tree.leaves(ts.actor), jax.tree.leaves(ts2.actor)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # refill + resume training
    ts3 = refill_slim(agent, ts2, seed=0)
    assert ts3.replay is not None
    ts4, info = agent.train_epoch(ts3)
    assert all(np.isfinite(float(v)) for v in jax.device_get(info).values()
               if np.ndim(v) == 0)


def test_checkpoint_validation_rejects_mismatched_network(tmp_path):
    """Loading a checkpoint saved by a differently-sized network fails AT THE
    BOUNDARY with a clear error (not deep inside jax)."""
    import pytest

    from isaacgymenv_tpu.envs.registry import get_task
    from isaacgymenv_tpu.learning.checkpoint import load_train_state, save_train_state
    from isaacgymenv_tpu.learning.ppo import PPO
    from isaacgymenv_tpu.utils.config import load_task_config, load_train_config

    cfg = load_task_config("Cartpole", num_envs=8)
    env = get_task("Cartpole")(cfg)
    tcfg = load_train_config("Cartpole")
    tcfg["params"]["config"].update(horizon_length=8, minibatch_size=64)
    tcfg["params"]["network"]["mlp"] = {"units": [16], "activation": "elu"}
    small = PPO(env, tcfg)
    path = str(tmp_path / "small.ckpt")
    save_train_state(small.init(0), path)

    import copy

    tcfg2 = copy.deepcopy(tcfg)
    tcfg2["params"]["network"]["mlp"] = {"units": [32, 32], "activation": "elu"}
    big = PPO(env, tcfg2)
    with pytest.raises(ValueError, match="params"):
        load_train_state(big, path)
    # same-config load still works
    ts = load_train_state(small, path)
    assert ts is not None


def test_sigma_override_sets_policy_std():
    """`sigma=<float>` on restore replaces the fixed log_std param
    (ref: train.py:217 sigma override)."""
    import numpy as np

    from isaacgymenv_tpu.envs.registry import get_task
    from isaacgymenv_tpu.learning.ppo import PPO
    from isaacgymenv_tpu.train import _override_sigma
    from isaacgymenv_tpu.utils.config import load_task_config, load_train_config

    cfg = load_task_config("Cartpole", num_envs=8)
    env = get_task("Cartpole")(cfg)
    tcfg = load_train_config("Cartpole")
    tcfg["params"]["config"].update(horizon_length=8, minibatch_size=64)
    agent = PPO(env, tcfg)
    ts = _override_sigma(agent.init(0), 0.25)
    log_std = ts.params["params"]["log_std"]
    np.testing.assert_allclose(np.asarray(log_std), np.log(0.25), rtol=1e-6)
