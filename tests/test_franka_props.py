"""FrankaCabinet shelf props: spawn grid, reset semantics, pair pruning
(ref: tasks/franka_cabinet.py:205-300,403-409)."""

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.physics.types import root_state, set_root_state
from isaacgymenv_tpu.utils.config import load_task_config


def test_props_spawn_grid_and_reset():
    cfg = load_task_config("FrankaCabinet", num_envs=2)
    assert int(cfg["env"]["numProps"]) == 16  # reference default
    env = registry.get_task("FrankaCabinet")(cfg)
    m = env.model

    # 16 free prop bodies appended after franka+cabinet
    assert env.num_props == 16
    assert len(env.prop_actors) == 16
    assert env.default_prop_states.shape == (16, 13)
    # sqrt-grid: 4x4 at spacing 0.09 centered on the drawer pose
    xs = np.unique(np.round(np.asarray(env.default_prop_states[:, 0]), 6))
    ys = np.unique(np.round(np.asarray(env.default_prop_states[:, 1]), 6))
    assert len(xs) == 4 and len(ys) == 4
    np.testing.assert_allclose(np.diff(xs), 0.09, atol=1e-6)
    np.testing.assert_allclose(np.diff(ys), 0.09, atol=1e-6)
    # identity spawn orientation, zero spawn velocity
    np.testing.assert_allclose(
        np.asarray(env.default_prop_states[:, 3:7]), [[0, 0, 0, 1]] * 16
    )
    np.testing.assert_allclose(np.asarray(env.default_prop_states[:, 7:]), 0.0)

    # static broadphase keeps the pair list bounded (was ~14k unpruned)
    assert len(m.pair_geom) < 10_000

    # initial_state places props at their spawn states
    s = env.initial_state(jax.random.PRNGKey(0))
    rs = root_state(m, s.sim)
    np.testing.assert_allclose(
        np.asarray(rs[:, env.prop_actors, :7]),
        np.broadcast_to(np.asarray(env.default_prop_states[:, :7]), (2, 16, 7)),
        atol=1e-5,
    )

    # masked reset restores ONLY the masked env's props.  root_state reads
    # the derived caches, so refresh with engine.forward after raw writes.
    from isaacgymenv_tpu.physics import engine

    rs_messy = rs.at[:, env.prop_actors, 0].add(0.5)
    sim = engine.forward(m, env.terrain, set_root_state(m, s.sim, rs_messy))
    s = s.replace(sim=sim)
    mask = jnp.array([True, False])
    s2 = env._reset_envs(s, mask, jax.random.PRNGKey(1))
    s2 = s2.replace(sim=engine.forward(m, env.terrain, s2.sim))
    rs2 = root_state(m, s2.sim)
    np.testing.assert_allclose(
        np.asarray(rs2[0, env.prop_actors, :3]),
        np.asarray(env.default_prop_states[:, :3]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(rs2[1, env.prop_actors, 0]),
        np.asarray(env.default_prop_states[:, 0]) + 0.5,
        atol=1e-5,
    )
