"""Actor-critic networks (flax) matching the reference's rl_games builder.

ref: cfg/train/*PPO.yaml `network:` blocks — shared MLP trunk
(`separate: False`), ELU activations, continuous gaussian head with
state-independent log-std (`fixed_sigma: True`, const init), linear mu/value
heads.  LSTM variants (AnymalTerrainPPO_LSTM etc.) are a separate module.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

_ACT = {
    "elu": nn.elu,
    "relu": nn.relu,
    "tanh": nn.tanh,
    "selu": nn.selu,
    "swish": nn.swish,
    "gelu": nn.gelu,
    "None": lambda x: x,
}


class ActorCritic(nn.Module):
    """Shared-trunk gaussian actor + value head."""

    num_actions: int
    units: Sequence[int] = (256, 128, 64)
    activation: str = "elu"
    separate: bool = False
    sigma_init: float = 0.0
    fixed_sigma: bool = True

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        act = _ACT[self.activation]

        def trunk(x, prefix):
            for i, u in enumerate(self.units):
                x = nn.Dense(u, name=f"{prefix}dense_{i}")(x)
                x = act(x)
            return x

        h = trunk(obs, "a_")
        mu = nn.Dense(self.num_actions, name="mu", kernel_init=nn.initializers.orthogonal(0.01))(h)
        hv = trunk(obs, "c_") if self.separate else h
        value = nn.Dense(1, name="value")(hv)[..., 0]

        if self.fixed_sigma:
            log_std = self.param(
                "log_std", nn.initializers.constant(self.sigma_init), (self.num_actions,)
            )
            log_std = jnp.broadcast_to(log_std, mu.shape)
        else:
            log_std = nn.Dense(self.num_actions, name="sigma")(h)
        return mu, log_std, value


class CentralValueNet(nn.Module):
    """Privileged-state value network for asymmetric actor-critic.

    The rl_games `central_value_config` network (ref: train.py:189-196 +
    cfg/train/ShadowHandPPOAsymm.yaml / AllegroHandDextreme*PPO.yaml
    `central_value_config.network`): an MLP over the env's `states` buffer
    (ref: tasks/base/vec_task.py:344 get_state) with a scalar value head.
    When enabled, the main policy's value head is unused and GAE/bootstrap
    values come from this network.
    """

    units: Sequence[int] = (512, 256, 128)
    activation: str = "elu"

    @nn.compact
    def __call__(self, states: jnp.ndarray):
        act = _ACT[self.activation]
        x = states
        for i, u in enumerate(self.units):
            x = nn.Dense(u, name=f"cv_dense_{i}")(x)
            x = act(x)
        return nn.Dense(1, name="cv_value")(x)[..., 0]


class _LSTMTrunk(nn.Module):
    """MLP + LSTM trunk with the rl_games rnn builder's layout options.

    before_mlp True puts the LSTM directly on the (raw) input with the MLP
    after it (ref: cfg/train/AllegroKukaLSTMPPO.yaml rnn.before_mlp: True);
    concat_input feeds the LSTM [trunk_out, input] (ShadowHandPPOLSTM);
    layer_norm normalizes the LSTM input (rl_games rnn_ln).
    """

    units: Sequence[int]
    activation: str
    lstm_units: int
    before_mlp: bool = False
    concat_input: bool = False
    layer_norm: bool = False
    name_prefix: str = "a_"

    @nn.compact
    def __call__(self, x: jnp.ndarray, carry):
        act = _ACT[self.activation]

        def mlp(y):
            for i, u in enumerate(self.units):
                y = act(nn.Dense(u, name=f"{self.name_prefix}dense_{i}")(y))
            return y

        if self.before_mlp:
            h = x
        else:
            h = mlp(x)
            if self.concat_input:
                h = jnp.concatenate([h, x], axis=-1)
        if self.layer_norm:
            h = nn.LayerNorm(name=f"{self.name_prefix}rnn_ln")(h)
        cell = nn.OptimizedLSTMCell(self.lstm_units, name=f"{self.name_prefix}lstm")
        carry, h = cell(carry, h)
        if self.before_mlp:
            h = mlp(h)
        return h, carry


class ActorCriticLSTM(nn.Module):
    """MLP/LSTM trunk -> gaussian actor + value heads.

    Mirrors rl_games' rnn builder (ref: cfg/train/AnymalTerrainPPO_LSTM.yaml,
    ShadowHandOpenAI_LSTMPPO.yaml, AllegroKukaLSTMPPO.yaml: rnn.name lstm,
    units, layers 1, before_mlp / concat_input / layer_norm options).
    """

    num_actions: int
    units: Sequence[int] = (256, 128, 64)
    activation: str = "elu"
    lstm_units: int = 128
    sigma_init: float = 0.0
    fixed_sigma: bool = True
    before_mlp: bool = False
    concat_input: bool = False
    layer_norm: bool = False

    @nn.compact
    def __call__(self, obs: jnp.ndarray, carry):
        x, carry = _LSTMTrunk(
            units=self.units, activation=self.activation,
            lstm_units=self.lstm_units, before_mlp=self.before_mlp,
            concat_input=self.concat_input, layer_norm=self.layer_norm,
            name_prefix="a_", name="trunk",
        )(obs, carry)
        mu = nn.Dense(self.num_actions, name="mu", kernel_init=nn.initializers.orthogonal(0.01))(x)
        value = nn.Dense(1, name="value")(x)[..., 0]
        if self.fixed_sigma:
            log_std = self.param(
                "log_std", nn.initializers.constant(self.sigma_init), (self.num_actions,)
            )
            log_std = jnp.broadcast_to(log_std, mu.shape)
        else:
            log_std = nn.Dense(self.num_actions, name="sigma")(x)
        return mu, log_std, value, carry

    def initial_carry(self, batch: int):
        z = jnp.zeros((batch, self.lstm_units))
        return (z, z)


class CentralValueLSTM(nn.Module):
    """Recurrent privileged-state critic (rl_games central_value_config with
    an rnn block — the DexPBT/asymm-LSTM configs, ref:
    cfg/train/AllegroKukaLSTMPPO.yaml central_value_config.network.rnn).
    Same trunk options as the policy LSTM; scalar value head."""

    units: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    lstm_units: int = 512
    before_mlp: bool = True
    concat_input: bool = False
    layer_norm: bool = True

    @nn.compact
    def __call__(self, states: jnp.ndarray, carry):
        x, carry = _LSTMTrunk(
            units=self.units, activation=self.activation,
            lstm_units=self.lstm_units, before_mlp=self.before_mlp,
            concat_input=self.concat_input, layer_norm=self.layer_norm,
            name_prefix="cv_", name="trunk",
        )(states, carry)
        return nn.Dense(1, name="cv_value")(x)[..., 0], carry

    def initial_carry(self, batch: int):
        z = jnp.zeros((batch, self.lstm_units))
        return (z, z)


def gaussian_logp(mu, log_std, action):
    """Diagonal gaussian log-density."""
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(
        -0.5 * ((action - mu) ** 2) / var - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
    )


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)


def gaussian_kl(mu0, log_std0, mu1, log_std1):
    """KL(old || new) for diagonal gaussians (rl_games adaptive-LR metric)."""
    var0, var1 = jnp.exp(2 * log_std0), jnp.exp(2 * log_std1)
    return jnp.sum(
        log_std1 - log_std0 + (var0 + (mu0 - mu1) ** 2) / (2.0 * var1) - 0.5, axis=-1
    )
