"""Static friction (stiction) tests for the anchored-slip-spring contact law.

PhysX resolves friction with TGS position iterations, so a loaded contact
in the static regime holds position exactly (ref: the reference's
locomotion tasks assume feet that do not skate, e.g. the terrain
curriculum promotes on distance walked, tasks/anymal_terrain.py:427-435).
A viscous-only penalty law (force ∝ slip velocity) cannot reproduce this:
stance feet must slide to generate traction.  These tests pin the stiction
behavior that locomotion quality depends on.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.physics import builder as B
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.types import JT_FREE, make_zero_state


def _box_model(mu=1.0, m=1.0):
    """A free 'crate' resting on the ground via 4 corner spheres."""
    mb = B.ModelBuilder()
    b = mb.add_body("crate", -1, JT_FREE, joint_pos=(0, 0, 0),
                    mass=m, inertia=B.box_inertia(m, 0.4, 0.4, 0.2))
    r = 0.05
    for sx in (-1, 1):
        for sy in (-1, 1):
            mb.add_geom_sphere(b, (0.2 * sx, 0.2 * sy, -0.1), r)
    mb.gravity = np.array([0.0, 0.0, -9.81])
    model = mb.finalize()
    model = model.replace(geom_friction=jnp.full((model.ng,), mu))
    from isaacgymenv_tpu.physics.meff import attach_effective_masses

    return attach_effective_masses(model), b, r


def _settle(model, state, n=60, dt=1 / 60, substeps=4, wrench=None):
    ctrl = engine.Control.zero(model, state.q.shape[0])
    if wrench is not None:
        ctrl = ctrl.replace(body_wrench=wrench)
    step = jax.jit(lambda s: engine.step(model, None, s, ctrl, dt, substeps))
    for _ in range(n):
        state = step(state)
    return state


def test_lateral_load_below_cone_holds():
    """A crate pushed with F < mu*m*g must NOT drift (zero steady creep)."""
    model, b, r = _box_model(mu=1.0, m=2.0)
    n_envs = 2
    state = make_zero_state(model, n_envs)
    state = state.replace(q=state.q.at[:, 2].set(0.16))
    state = _settle(model, state, 60)
    x0 = float(state.q[0, 0])

    # push with half the Coulomb limit for 2 simulated seconds
    f_push = 0.5 * 1.0 * 2.0 * 9.81
    wrench = jnp.zeros((n_envs, model.nb, 6)).at[:, b, 3].set(f_push)
    state = _settle(model, state, 120, wrench=wrench)
    drift = float(state.q[0, 0]) - x0
    # elastic displacement only: the slip spring stretches mu*fn/k_t (~mm)
    assert abs(drift) < 0.01, f"crate crept {drift:.4f} m under sub-cone load"
    vx = float(state.qd[0, 3])
    assert abs(vx) < 0.01, f"steady-state sliding velocity {vx:.4f}"


def test_lateral_load_above_cone_slides():
    """F > mu*m*g must slide — the cone still clamps the spring."""
    model, b, r = _box_model(mu=0.5, m=2.0)
    state = make_zero_state(model, 1)
    state = state.replace(q=state.q.at[:, 2].set(0.16))
    state = _settle(model, state, 60)
    x0 = float(state.q[0, 0])
    f_push = 2.0 * 0.5 * 2.0 * 9.81  # 2x the cone limit
    wrench = jnp.zeros((1, model.nb, 6)).at[:, b, 3].set(f_push)
    state = _settle(model, state, 120, wrench=wrench)
    drift = float(state.q[0, 0]) - x0
    assert drift > 0.3, f"crate should slide under super-cone load, moved {drift:.4f}"


def test_incline_below_friction_angle_holds():
    """Gravity component below the cone (mu > tan(theta)) -> statics hold.

    Emulated by tilting gravity instead of the ground: g_t/g_n = tan(20deg)
    with mu = 1.0 -> must stick."""
    model, b, r = _box_model(mu=1.0, m=1.0)
    th = np.deg2rad(20.0)
    model = model.replace(
        gravity=jnp.array([9.81 * np.sin(th), 0.0, -9.81 * np.cos(th)])
    )
    state = make_zero_state(model, 1)
    state = state.replace(q=state.q.at[:, 2].set(0.16))
    # touchdown transient: the anchor engages within ~1 s of settling
    state = _settle(model, state, 60)
    x0 = float(state.q[0, 0])
    state = _settle(model, state, 180)
    drift = float(state.q[0, 0]) - x0
    assert abs(drift) < 0.005, (
        f"crate crept {drift:.4f} m down a sub-friction-angle slope"
    )


def test_anymal_stands_at_default_pose():
    """Zero-action ANYmal must catch itself from spawn and stand.

    Before stiction the splayed legs skated outward on the viscous-only
    friction and the robot belly-flopped into a knee-contact reset cycle
    (terrain policies then learned to crawl instead of walk)."""
    from isaacgymenv_tpu.envs.registry import get_task
    from isaacgymenv_tpu.utils.config import load_task_config
    from isaacgymenv_tpu.physics.types import root_state

    cfg = load_task_config("Anymal", num_envs=4)
    env = get_task("Anymal")(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    dones = 0
    zs = []
    for t in range(150):
        state, obs, rew, done, ex = step(
            state, jnp.zeros((4, env.num_actions))
        )
        dones += int(np.asarray(done).sum())
        if t >= 50:
            zs.append(np.asarray(root_state(env.model, state.sim)[:, 0, 2]))
    z = np.stack(zs)
    assert dones == 0, f"{dones} falls while holding the default pose"
    assert 0.4 < z.mean() < 0.6, f"standing height {z.mean():.3f}"
    assert z.std() < 0.02, f"standing height oscillation {z.std():.4f}"
