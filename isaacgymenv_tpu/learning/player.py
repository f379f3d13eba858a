"""Inference/evaluation player — the reference's CommonPlayer loop.

Per-episode reward/length accounting on done indices, a games_num budget,
deterministic-vs-sampled actions, and RNN-state zeroing on done
(ref: learning/common_player.py:54-152).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def run_player(
    agent,
    ts,
    venv,
    games_num: int = 64,
    max_steps: int = 100_000,
    deterministic: bool = True,
    print_stats: bool = True,
):
    """Run episodes until `games_num` episodes finish (or max_steps).

    Returns dict(mean_reward, mean_length, games_played).
    """
    n = venv.num_envs
    is_rnn = hasattr(agent, "act_with_state")
    rnn = agent.network.initial_carry(n) if is_rnn else None

    obs_dict = venv.reset()
    cur_reward = np.zeros(n)
    cur_length = np.zeros(n, np.int64)
    ep_rewards: list[float] = []
    ep_lengths: list[int] = []
    key = jax.random.PRNGKey(0)

    if is_rnn:
        act_fn = jax.jit(
            lambda t, o, r, k: agent.act_with_state(t, o, r, deterministic, k),
            static_argnums=(),
        )
    else:
        act_fn = jax.jit(lambda t, o, k: agent.act(t, o, deterministic, k))

    steps = 0
    while len(ep_rewards) < games_num and steps < max_steps:
        obs = obs_dict["obs"]
        key, k = jax.random.split(key)
        if is_rnn:
            action, rnn = act_fn(ts, obs, rnn, k)
        else:
            action = act_fn(ts, obs, k)
        obs_dict, rew, done, extras = venv.step(action)
        steps += 1
        cur_reward += np.asarray(rew, np.float64)
        cur_length += 1
        done_ids = np.nonzero(np.asarray(done))[0]
        for i in done_ids:
            ep_rewards.append(float(cur_reward[i]))
            ep_lengths.append(int(cur_length[i]))
            if print_stats and len(ep_rewards) <= 32:
                print(
                    f"episode {len(ep_rewards):4d} | reward {cur_reward[i]:10.3f} "
                    f"| steps {cur_length[i]}"
                )
        cur_reward[done_ids] = 0.0
        cur_length[done_ids] = 0
        if done_ids.size and is_rnn:
            # zero hidden state for finished episodes (rl_games semantics)
            mask = jnp.asarray(~np.isin(np.arange(n), done_ids), jnp.float32)[:, None]
            rnn = (rnn[0] * mask, rnn[1] * mask)
        # envs auto-reset inside step (reference post_physics contract); the
        # explicit reset_done call covers deferred-family first-obs freshness
        if done_ids.size:
            obs_dict, _ = venv.reset_done()

    games = len(ep_rewards)
    mean_r = float(np.mean(ep_rewards)) if games else float(cur_reward.mean())
    mean_l = float(np.mean(ep_lengths)) if games else float(cur_length.mean())
    if print_stats:
        print(f"av reward: {mean_r:.3f} av steps: {mean_l:.1f} games: {games}")
    return dict(mean_reward=mean_r, mean_length=mean_l, games_played=games)
