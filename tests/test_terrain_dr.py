"""Terrain generation + domain randomization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.utils.config import load_task_config, set_dotted
from isaacgymenv_tpu.utils import terrain as T


def test_subterrain_generators():
    rng = np.random.default_rng(0)
    t = T.SubTerrain(width=80, length=80)
    T.pyramid_sloped_terrain(t, slope=0.3, platform_size=3.0)
    hf = t.height_field_raw
    assert hf.max() > 0 and hf[40, 40] == hf.max()  # apex at center

    t2 = T.SubTerrain(width=80, length=80)
    T.pyramid_stairs_terrain(t2, step_width=0.31, step_height=0.15, platform_size=3.0)
    steps = np.unique(t2.height_field_raw)
    assert len(steps) > 3  # multiple stair levels

    t3 = T.SubTerrain(width=80, length=80)
    T.random_uniform_terrain(t3, -0.1, 0.1, step=0.025, downsampled_scale=0.2, rng=rng)
    assert t3.height_field_raw.std() > 0

    t4 = T.SubTerrain(width=80, length=80)
    T.discrete_obstacles_terrain(t4, 0.15, 1.0, 2.0, 20, platform_size=3.0, rng=rng)
    assert t4.height_field_raw[40, 40] == 0  # flat platform

    t5 = T.SubTerrain(width=80, length=80)
    T.stepping_stones_terrain(t5, stone_size=1.0, stone_distance=0.3, max_height=0.0, rng=rng)
    assert t5.height_field_raw.min() < -100  # gaps are deep


def test_terrain_grid_composer():
    cfg = dict(
        terrainType="trimesh", mapLength=8.0, mapWidth=8.0, numLevels=3,
        numTerrains=4, terrainProportions=[0.1, 0.1, 0.35, 0.25, 0.2],
        curriculum=True, slopeTreshold=0.5,
    )
    grid = T.TerrainGrid(cfg, num_robots=16, seed=0)
    assert grid.env_origins.shape == (3, 4, 3)
    # borders present and zero
    b = grid.border
    assert np.all(grid.height_field_raw[:b, :] == 0)
    # origins inside their cells
    assert np.all(grid.env_origins[..., 0] > 0)
    # deterministic under seed
    grid2 = T.TerrainGrid(cfg, num_robots=16, seed=0)
    np.testing.assert_array_equal(grid.height_field_raw, grid2.height_field_raw)


def test_height_lookup_min_corner_semantics():
    """The reference takes min(corner, corner+diag) — not bilinear
    (anymal_terrain.py:533-536)."""
    from isaacgymenv_tpu.physics.contact import Heightfield, height_at

    hf = Heightfield(
        heights=jnp.array([[0.0, 1.0], [2.0, 3.0]]), hscale=1.0, border_x=0.0, border_y=0.0
    )
    # at (0.5, 0.5): corners (0,0)=0 and (1,1)=3 -> min = 0
    assert float(height_at(hf, jnp.array(0.5), jnp.array(0.5))) == 0.0


def test_domain_randomization_per_env():
    cfg = load_task_config("Anymal", num_envs=8)
    set_dotted(cfg, "task.randomize", True)
    env = registry.get_task("Anymal")(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    assert "dr_params" in state.ts
    # force a full-schedule reroll
    ts = dict(state.ts)
    ts["dr_step"] = jnp.asarray(10_000, jnp.int32)
    ts["dr_elapsed"] = jnp.full((8,), 10_000, jnp.int32)
    state = state.replace(ts=ts)
    state = env._do_reset(state, jnp.ones(8, bool), jax.random.PRNGKey(1))
    p = state.ts["dr_params"]
    mass_scale = np.asarray(p["body_mass"][:, 0]) / float(env.model.body_mass[0])
    assert mass_scale.std() > 0.05, "per-env mass randomization inactive"
    assert mass_scale.min() >= 0.5 and mass_scale.max() <= 1.5
    fr = np.asarray(p["geom_friction"])
    assert fr.min() >= 0.7 - 1e-5 and fr.max() <= 1.3 + 1e-5
    # stepping with randomized params works and differs across envs
    step = jax.jit(env.step)
    for _ in range(3):
        state, obs, rew, done, extras = step(state, jnp.zeros((8, 12)))
    assert bool(np.isfinite(np.asarray(obs["obs"])).all())


def test_dr_frequency_gating():
    cfg = load_task_config("Anymal", num_envs=4)
    set_dotted(cfg, "task.randomize", True)
    set_dotted(cfg, "task.randomization_params.frequency", 1000)
    env = registry.get_task("Anymal")(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    before = np.asarray(state.ts["dr_params"]["dof_stiffness"])
    # resetting before `frequency` steps elapse must NOT re-roll
    state = env._do_reset(state, jnp.ones(4, bool), jax.random.PRNGKey(9))
    after = np.asarray(state.ts["dr_params"]["dof_stiffness"])
    np.testing.assert_array_equal(before, after)


def test_anymal_terrain_env_steps():
    cfg = load_task_config("AnymalTerrain", num_envs=4)
    set_dotted(cfg, "env.terrain.terrainType", "trimesh")
    set_dotted(cfg, "env.terrain.numLevels", 2)
    set_dotted(cfg, "env.terrain.numTerrains", 3)
    env = registry.get_task("AnymalTerrain")(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(6):
        state, obs, rew, done, extras = step(state, jnp.zeros((4, 12)))
    assert obs["obs"].shape == (4, 188)
    assert bool(np.isfinite(np.asarray(obs["obs"])).all())
    assert "episode" in extras and "rew_lin_vel_xy" in extras["episode"]
    # height obs slice is within clip*scale bounds
    h = np.asarray(obs["obs"][:, 36:176])
    assert np.abs(h).max() <= 5.0 + 1.0  # scale 5 + noise margin
