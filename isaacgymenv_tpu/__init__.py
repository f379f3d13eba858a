"""isaacgymenv_tpu — a TPU-native vectorized environment engine + RL stack.

A from-scratch rebuild of the capabilities of dohyeon-Lee/IsaacgymEnv
(a fork of NVIDIA IsaacGymEnvs v1.4.0) designed for TPU hardware:

- batched articulated rigid-body physics as pure JAX functions (jit/vmap),
- task observation/reward/reset logic as pure functions over a SimState pytree,
- an on-device PPO learner (lax.scan rollouts, no host round-trips),
- env-axis sharding over a `jax.sharding.Mesh` for multi-chip scaling.

Public API mirrors the reference's `isaacgymenvs.make` (ref: __init__.py:14).
"""

__version__ = "0.1.0"

from isaacgymenv_tpu.api import make  # noqa: F401
