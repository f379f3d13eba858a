"""AMP subsystem: MotionLib correctness + discriminator training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import os

from isaacgymenv_tpu.utils.config import asset_root

MOTION = os.path.join(asset_root(), "amp/motions/amp_humanoid_walk.npy")
KEYS = ["right_hand", "left_hand", "right_foot", "left_foot"]


@pytest.fixture(scope="module")
def mlib():
    from isaacgymenv_tpu.utils.motion_lib import MotionLib

    return MotionLib(MOTION, 28, KEYS)


def test_motion_state_shapes_and_sanity(mlib):
    k = jax.random.PRNGKey(0)
    ids = mlib.sample_motions(k, 32)
    times = mlib.sample_time(jax.random.fold_in(k, 1), ids)
    rp, rr, dp, rv, rav, dv, kp = mlib.get_motion_state(ids, times)
    assert rp.shape == (32, 3) and rr.shape == (32, 4)
    assert dp.shape == (32, 28) and dv.shape == (32, 28)
    assert kp.shape == (32, 4, 3)
    # quaternions normalized, walk root height plausible, feet near ground
    assert np.allclose(np.linalg.norm(np.asarray(rr), axis=-1), 1.0, atol=1e-3)
    assert np.all(np.asarray(rp)[:, 2] > 0.5) and np.all(np.asarray(rp)[:, 2] < 1.2)
    feet_z = np.asarray(kp)[:, 2:, 2]
    assert np.all(feet_z < 0.5)


def test_motion_state_interpolates_continuously(mlib):
    ids = jnp.zeros(3, jnp.int32)
    dt = float(mlib.data.dt[0])
    t = jnp.array([1.0, 1.0 + dt / 2, 1.0 + dt])
    rp, rr, dp, *_ = mlib.get_motion_state(ids, t)
    # midpoint between neighbors
    mid = 0.5 * (np.asarray(rp[0]) + np.asarray(rp[2]))
    assert np.allclose(np.asarray(rp[1]), mid, atol=1e-3)


def test_amp_obs_and_demo():
    from isaacgymenv_tpu.api import make

    env = make(seed=0, task="HumanoidAMP", num_envs=4)
    env.reset()
    obs, rew, done, ex = env.step(jnp.zeros((4, 28)))
    assert ex["amp_obs"].shape == (4, 210)
    demo = env.task.fetch_amp_obs_demo(jax.random.PRNGKey(1), 8)
    assert demo.shape == (8, 210)
    assert np.isfinite(np.asarray(demo)).all()
    # demo obs should look like healthy humanoid states: root height ~0.8-1
    root_h = np.asarray(demo)[:, 0]
    assert np.all(root_h > 0.4) and np.all(root_h < 1.5)


def test_amp_discriminator_learns_to_separate():
    """After a few epochs the discriminator should label demo > agent."""
    from isaacgymenv_tpu.envs.registry import get_task
    from isaacgymenv_tpu.learning.amp import AMPPPO
    from isaacgymenv_tpu.utils.config import load_task_config, load_train_config

    cfg = load_task_config("HumanoidAMP", num_envs=16)
    env = get_task("HumanoidAMP")(cfg)
    tc = load_train_config("HumanoidAMP", "HumanoidAMPPPO")
    c = tc["params"]["config"]
    c["minibatch_size"], c["horizon_length"] = 64, 4
    c["mini_epochs"] = 2
    c["amp_minibatch_size"], c["amp_replay_buffer_size"] = 64, 1024
    agent = AMPPPO(env, tc)
    ts = agent.init(0)
    for _ in range(4):
        ts, info = agent.train_epoch(ts)
    assert float(info["disc_demo_acc"]) > 0.7
    assert np.isfinite(float(info["disc_loss"]))
    assert float(info["disc_reward"]) > 0.0
