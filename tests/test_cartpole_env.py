"""Cartpole env contract tests (reference semantics, SURVEY.md §3.3)."""

import numpy as np
import jax
import jax.numpy as jnp

import isaacgymenv_tpu
from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.utils.config import load_task_config


def make_env(n=16):
    cfg = load_task_config("Cartpole", num_envs=n)
    return registry.get_task("Cartpole")(cfg)


def test_make_api():
    env = isaacgymenv_tpu.make(seed=0, task="Cartpole", num_envs=8)
    obs = env.reset()
    assert obs["obs"].shape == (8, 4)
    obs, rew, done, extras = env.step(jnp.zeros((8, 1)))
    assert rew.shape == (8,) and done.shape == (8,)
    assert "time_outs" in extras
    assert env.observation_space.shape == (4,)
    assert env.action_space.shape == (1,)


def test_reset_distribution():
    env = make_env(512)
    state = env.initial_state(jax.random.PRNGKey(1))
    obs = env.observations(state)["obs"]
    o = np.asarray(obs)
    # ref: cartpole.py:148-151 — pos ~ U(-0.1, 0.1), vel ~ U(-0.25, 0.25)
    assert np.abs(o[:, 0]).max() <= 0.1 + 1e-6
    assert np.abs(o[:, 1]).max() <= 0.25 + 1e-6
    assert np.abs(o[:, 2]).max() <= 0.1 + 1e-6
    assert o[:, 0].std() > 0.02  # actually randomized


def test_termination_and_autoreset():
    env = make_env(8)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    push = jnp.ones((8, 1))
    done_seen = False
    for i in range(80):
        state, obs, rew, done, extras = step(state, push)
        if bool(done.any()):
            done_seen = True
            # terminal reward is -2 (ref: cartpole.py:190-192)
            d = np.asarray(done)
            r = np.asarray(rew)
            assert np.allclose(r[d], -2.0)
            # next step returns a fresh-episode obs for done envs
            state, obs2, *_ = step(state, jnp.zeros((8, 1)))
            o2 = np.asarray(obs2["obs"])[d]
            assert np.abs(o2[:, 2]).max() < 0.4  # pole near upright again
            break
    assert done_seen, "constant push should topple the pole within 80 steps"


def test_timeout_flag():
    env = make_env(4)
    env.max_episode_length = 10
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(12):
        state, obs, rew, done, extras = step(state, jnp.zeros((4, 1)))
        if i == 8:  # progress hits 9 = max_len-1
            assert bool(done.all())
            assert bool(extras["time_outs"].all())


def test_deterministic_given_seed():
    env = make_env(8)
    s1 = env.initial_state(jax.random.PRNGKey(7))
    s2 = env.initial_state(jax.random.PRNGKey(7))
    step = jax.jit(env.step)
    a = jnp.ones((8, 1)) * 0.3
    for _ in range(5):
        s1, o1, r1, d1, _ = step(s1, a)
        s2, o2, r2, d2, _ = step(s2, a)
    np.testing.assert_array_equal(np.asarray(o1["obs"]), np.asarray(o2["obs"]))
