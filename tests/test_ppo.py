"""PPO learner tests: learning signal on Cartpole + distributed parity."""

import numpy as np
import jax

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.learning.ppo import PPO
from isaacgymenv_tpu.parallel.mesh import make_mesh
from isaacgymenv_tpu.parallel.trainer import DistributedPPO
from isaacgymenv_tpu.utils.config import load_task_config, load_train_config


def small_cfgs(num_envs=128):
    cfg = load_task_config("Cartpole", num_envs=num_envs)
    tcfg = load_train_config("Cartpole")
    tcfg["params"]["config"]["minibatch_size"] = num_envs * 16 // 1
    return cfg, tcfg


def test_ppo_learns_cartpole():
    cfg, tcfg = small_cfgs(128)
    env = registry.get_task("Cartpole")(cfg)
    agent = PPO(env, tcfg)
    ts = agent.init(0)
    first = None
    for ep in range(25):
        ts, info = agent.train_epoch(ts)
        if ep == 4:
            first = float(info["mean_return"])
    last = float(info["mean_return"])
    assert last > first + 5.0, f"no learning signal: {first} -> {last}"
    assert last > 15.0, f"cartpole should reach return > 15 in 25 epochs, got {last}"
    assert np.isfinite(float(info["loss"]))


def test_distributed_ppo_runs_and_learns():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg, tcfg = small_cfgs(128)
    env = registry.get_task("Cartpole")(cfg)
    agent = DistributedPPO(env, tcfg, make_mesh(8))
    ts = agent.init(0)
    for ep in range(15):
        ts, info = agent.train_epoch(ts)
    # env state sharded over mesh, params replicated
    assert ts.env_state.sim.q.sharding.spec == jax.sharding.PartitionSpec("env")
    leaf = jax.tree.leaves(ts.params)[0]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec()
    assert float(info["mean_return"]) > 5.0
    assert np.isfinite(float(info["loss"]))


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(8)


def test_lstm_ppo_learns_cartpole():
    """LSTM-PPO (truncated BPTT) improves on Cartpole within a few epochs."""
    import jax

    from isaacgymenv_tpu.envs.registry import get_task
    from isaacgymenv_tpu.learning.ppo_lstm import LSTMPPO
    from isaacgymenv_tpu.utils.config import load_task_config, load_train_config

    cfg = load_task_config("Cartpole", num_envs=32)
    env = get_task("Cartpole")(cfg)
    tc = load_train_config("Cartpole")
    tc["params"]["network"]["rnn"] = {"units": 64}
    tc["params"]["config"].update(
        {"minibatch_size": 256, "horizon_length": 16, "seq_len": 4, "mini_epochs": 2}
    )
    agent = LSTMPPO(env, tc)
    ts = agent.init(0)
    first = None
    for i in range(15):
        ts, info = agent.train_epoch(ts)
        if i == 2:
            first = float(info["mean_return"])
    assert float(info["mean_return"]) > first


def test_ppo_central_value_learns_cartpole():
    """Asymmetric actor-critic: values come from a privileged-state critic
    (rl_games central_value_config path, ref: cfg/train/ShadowHandPPOAsymm.yaml).
    Synthetic states = [obs, obs^2] verify the full plumbing learns."""
    import jax.numpy as jnp

    cfg, tcfg = small_cfgs(128)
    tcfg["params"]["config"]["central_value_config"] = {
        "mini_epochs": 4,
        "learning_rate": 5e-4,
        "network": {"mlp": {"units": [64, 64], "activation": "elu"}},
    }

    base_cls = registry.get_task("Cartpole")

    class CartpoleAsym(base_cls):
        num_states = 8

        def _states(self, state, obs):
            return jnp.concatenate([obs, obs**2], axis=-1)

    env = CartpoleAsym(cfg)
    agent = PPO(env, tcfg)
    assert agent.central_value
    ts = agent.init(0)
    assert ts.cv_params is not None and ts.last_states.shape == (128, 8)
    first = None
    for ep in range(25):
        ts, info = agent.train_epoch(ts)
        if ep == 4:
            first = float(info["mean_return"])
    last = float(info["mean_return"])
    assert last > first + 5.0, f"no learning signal: {first} -> {last}"
    assert last > 15.0, f"asym cartpole should reach return > 15, got {last}"
    assert np.isfinite(float(info["v_loss"]))


def test_lstm_ppo_central_value_runs():
    """LSTM policy + privileged-state central value critic (rl_games
    ShadowHandPPOAsymmLSTM shape) trains without NaNs."""
    import jax.numpy as jnp

    cfg, tcfg = small_cfgs(32)
    tcfg["params"]["network"]["rnn"] = {"name": "lstm", "units": 32, "layers": 1}
    tcfg["params"]["config"]["seq_len"] = 4
    tcfg["params"]["config"]["horizon_length"] = 16
    tcfg["params"]["config"]["minibatch_size"] = 32 * 16
    tcfg["params"]["config"]["central_value_config"] = {
        "mini_epochs": 2,
        "learning_rate": 5e-4,
        "network": {"mlp": {"units": [32], "activation": "elu"}},
    }

    from isaacgymenv_tpu.learning.ppo_lstm import LSTMPPO

    base_cls = registry.get_task("Cartpole")

    class CartpoleAsym(base_cls):
        num_states = 8

        def _states(self, state, obs):
            return jnp.concatenate([obs, obs**2], axis=-1)

    env = CartpoleAsym(cfg)
    agent = LSTMPPO(env, tcfg)
    assert agent.central_value
    ts = agent.init(0)
    for _ in range(3):
        ts, info = agent.train_epoch(ts)
    assert np.isfinite(float(info["loss"]))
    assert np.isfinite(float(info["v_loss"]))


def test_lstm_ppo_recurrent_central_value_runs():
    """LSTM policy + RECURRENT central value (rl_games central_value_config
    with an rnn block — the AllegroKuka/asymm-LSTM configs,
    ref: cfg/train/AllegroHandLSTMPPO.yaml): truncated-BPTT critic update
    with carried cv hidden state, zeroed on done."""
    import jax.numpy as jnp

    cfg, tcfg = small_cfgs(32)
    tcfg["params"]["network"]["rnn"] = {
        "name": "lstm", "units": 32, "layers": 1,
        "before_mlp": True, "layer_norm": True,
    }
    tcfg["params"]["config"]["seq_len"] = 4
    tcfg["params"]["config"]["horizon_length"] = 16
    tcfg["params"]["config"]["minibatch_size"] = 32 * 16
    tcfg["params"]["config"]["central_value_config"] = {
        "mini_epochs": 2,
        "learning_rate": 5e-4,
        "network": {
            "mlp": {"units": [32], "activation": "elu"},
            "rnn": {"name": "lstm", "units": 32, "before_mlp": True,
                    "layer_norm": True},
        },
    }

    from isaacgymenv_tpu.learning.ppo_lstm import LSTMPPO

    base_cls = registry.get_task("Cartpole")

    class CartpoleAsym(base_cls):
        num_states = 8

        def _states(self, state, obs):
            return jnp.concatenate([obs, obs**2], axis=-1)

    env = CartpoleAsym(cfg)
    agent = LSTMPPO(env, tcfg)
    assert agent.central_value and agent.cv_is_rnn
    ts = agent.init(0)
    assert ts.cv_rnn_state is not None
    for _ in range(3):
        ts, info = agent.train_epoch(ts)
    assert np.isfinite(float(info["loss"]))
    assert np.isfinite(float(info["v_loss"]))
