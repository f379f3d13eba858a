"""OSC arm-reach tasks: controller correctness.

The OSC law (ref: hound_arm.py:462-493) should servo the end-effector to a
task-space target when fed dpose = k*(target - eef_pos): verify the reach
error shrinks by a large factor, which exercises Jacobian, CRBA mass matrix,
and the torque path end-to-end.
"""

import numpy as np
import pytest


@pytest.mark.parametrize("task", ["Houndarm", "Manipulator"])
def test_osc_servo_reaches_target(task):
    import jax
    import jax.numpy as jnp

    from isaacgymenv_tpu.api import make

    env = make(seed=0, task=task, num_envs=4)
    env.reset()
    t = env.task
    state = env.state
    target = state.ts["commands"]
    d0 = None

    @jax.jit
    def servo_step(state):
        eef = state.sim.body_pos[:, t.eef_body]
        err = state.ts["commands"] - eef
        # act in normalized units: step() scales by cmd_limit/action_scale
        dpos = jnp.clip(err * 20.0, -1.0, 1.0)
        act = jnp.concatenate([dpos, jnp.zeros_like(dpos)], -1)
        return t.step(state, act)

    for i in range(120):
        state, obs, rew, done, ex = servo_step(state)
        if i == 0:
            d0 = np.linalg.norm(
                np.asarray(state.sim.body_pos[:, t.eef_body] - target), axis=-1
            )
    d1 = np.linalg.norm(
        np.asarray(state.sim.body_pos[:, t.eef_body] - target), axis=-1
    )
    assert np.isfinite(d1).all()
    # servoing should cut the initial error dramatically
    assert np.median(d1) < 0.05, f"{task}: final dist {d1} (start {d0})"


def test_franka_masses_from_meshes():
    """franka_panda.urdf has no <inertial> tags; the loader must fill mass
    and inertia from the collision meshes' AABBs (real arm is ~18 kg)."""
    from isaacgymenv_tpu.api import make

    env = make(seed=0, task="Manipulator", num_envs=1)
    m = env.task.model
    total = float(np.asarray(m.body_mass).sum())
    assert 5.0 < total < 100.0, total
    assert all(mass > 0 for mass in np.asarray(m.body_mass)[1:8])
