"""SDF mesh collision: voxelizer accuracy, trilinear query, and sim-level
resting/containment behavior (the PhysX SDF collider equivalent,
ref: tasks/factory/factory_base.py:483)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenv_tpu.physics import builder as B
from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics import sdf
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import JT_FIXED, JT_FREE, make_zero_state


def _cube_mesh(half=0.5):
    v = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)]
    )
    f = []
    for q in [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]:
        f += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
    return v, np.array(f)


def _exact_box_sdf(pts, half=0.5):
    q = np.abs(pts) - half
    outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0)
    return outside + inside


def test_mesh_sdf_grid_matches_analytic_box():
    v, f = _cube_mesh()
    dist, origin, sp = sdf.mesh_sdf_grid(v, f, res=48)
    pts = np.random.RandomState(0).uniform(-0.85, 0.85, (400, 3))
    d, grad = sdf.sdf_query(jnp.asarray(dist), jnp.asarray(origin), sp, jnp.asarray(pts))
    exact = _exact_box_sdf(pts)
    err = np.abs(np.asarray(d) - exact)
    assert err.mean() < 0.5 * sp, f"mean {err.mean()} vs spacing {sp}"
    # sign correctness away from the surface (within half a voxel of the
    # boundary trilinear smoothing can flip it)
    far = np.abs(exact) > sp
    assert (np.sign(np.asarray(d)[far]) == np.sign(exact[far])).all()
    # gradients near unit norm away from edges
    gn = np.linalg.norm(np.asarray(grad), axis=-1)
    assert 0.7 < np.median(gn) < 1.3


def test_sdf_query_far_field_positive():
    v, f = _cube_mesh()
    dist, origin, sp = sdf.mesh_sdf_grid(v, f, res=24)
    # way outside the grid: clamped boundary + euclidean offset, so the
    # distance keeps growing and stays positive
    far = jnp.array([[5.0, 0.0, 0.0], [0.0, 0.0, -9.0]])
    d, _ = sdf.sdf_query(jnp.asarray(dist), jnp.asarray(origin), sp, far)
    assert (np.asarray(d) > 3.0).all()


def _sdf_scene(dist, origin, sp, drop_pos, radius=0.05, mass=0.2):
    """Fixed SDF carrier at the world origin + a free sphere actor."""
    mb = B.ModelBuilder()
    carrier = mb.add_body("carrier", -1, JT_FIXED, joint_pos=(0, 0, 0), mass=10.0,
                          inertia=B.box_inertia(10.0, 1, 1, 1))
    mb.add_sdf(carrier, dist, origin, sp, friction=1.0)
    ball = mb.add_body("ball", -1, JT_FREE, mass=mass,
                       inertia=B.box_inertia(mass, 2 * radius, 2 * radius, 2 * radius))
    mb.add_geom_sphere(ball, (0, 0, 0), radius, 1.0)
    model = attach_effective_masses(mb.finalize())
    state = make_zero_state(model, 1)
    q = state.q.at[0, model.q_adr[ball] : model.q_adr[ball] + 3].set(jnp.asarray(drop_pos))
    return model, ball, state.replace(q=q)


def _settle(model, state, steps=150, dt=0.01, substeps=4):
    ctrl = engine.Control.zero(model, 1)
    step = jax.jit(lambda s: engine.step(model, None, s, ctrl, dt, substeps))
    for _ in range(steps):
        state = step(state)
    return state


def test_ball_rests_on_sdf_cube():
    v, f = _cube_mesh(0.5)  # cube top at z = +0.5
    dist, origin, sp = sdf.mesh_sdf_grid(v, f, res=48)
    r = 0.05
    model, ball, state = _sdf_scene(dist, origin, sp, (0.0, 0.0, 0.8), radius=r)
    state = _settle(model, state)
    z = float(state.q[0, model.q_adr[ball] + 2])
    # rests on the cube top (0.5 + r), allowing penalty penetration ~1 voxel
    assert 0.5 + r - 1.5 * sp < z < 0.5 + r + 0.02, z
    qd = np.asarray(state.qd[0])
    assert np.abs(qd).max() < 0.05, "ball should be at rest"


def test_peg_contained_by_hole_sdf():
    """The factory insertion socket: a ball dropped into the 8 mm hole stays
    laterally contained and settles INSIDE the cavity, not on the plate."""
    path = "assets/factory/mesh/factory_insertion/factory_round_hole_8mm_subdiv_3x.obj"
    import os

    from isaacgymenv_tpu.utils.config import asset_root

    full = os.path.join(asset_root(), "factory/mesh/factory_insertion/factory_round_hole_8mm_subdiv_3x.obj")
    if not os.path.exists(full):
        pytest.skip(f"factory insertion mesh not vendored: {full}")
    v, f = sdf.load_obj(full)
    dist, origin, sp = sdf.mesh_sdf_grid(v, f, res=64)
    center = (v.min(0) + v.max(0)) / 2.0
    top = v.max(0)[2]
    r = 0.002  # 2 mm ball into the 4 mm-radius hole
    model, ball, state = _sdf_scene(
        dist, origin, sp,
        (float(center[0]) + 0.001, float(center[1]), top + 0.004),
        radius=r, mass=0.01,
    )
    state = _settle(model, state, steps=250, dt=0.002, substeps=4)
    p = np.asarray(state.q[0, model.q_adr[ball] : model.q_adr[ball] + 3])
    lateral = np.linalg.norm(p[:2] - center[:2])
    assert lateral < 0.004, f"ball escaped the hole laterally: {lateral}"
    assert p[2] < top - 0.002, f"ball should settle inside the cavity: z={p[2]} top={top}"
    # plate control: dropped ONTO the plate material it stays on top
    model2, ball2, state2 = _sdf_scene(
        dist, origin, sp,
        (float(v.max(0)[0]) - 0.002, float(center[1]), top + 0.004),
        radius=r, mass=0.01,
    )
    state2 = _settle(model2, state2, steps=250, dt=0.002, substeps=4)
    p2 = np.asarray(state2.q[0, model2.q_adr[ball2] : model2.q_adr[ball2] + 3])
    assert p2[2] > top - 1.5 * sp, f"control ball sank into the plate: z={p2[2]}"


def test_factory_insertion_peg_drops_into_hole():
    """FactoryTaskInsertion env: a centered plug drops INTO the mesh-SDF
    socket hole under gravity (real insertion mechanics, which the
    reference's sandbox never exercises)."""
    import os

    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.physics.types import root_state
    from isaacgymenv_tpu.utils.config import asset_root, load_task_config

    mesh = os.path.join(
        asset_root(), "factory/mesh/factory_insertion/factory_round_hole_8mm_subdiv_3x.obj"
    )
    if not os.path.exists(mesh):
        pytest.skip("factory insertion mesh not vendored")
    cfg = load_task_config("FactoryTaskInsertion", num_envs=2)
    cfg.setdefault("randomize", {})["noise_xy"] = 0.0  # spawn centered on the hole
    env = registry.get_task("FactoryTaskInsertion")(cfg)
    assert env.model.n_sdf == 1
    s = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.zeros((2, env.num_actions))
    for _ in range(120):
        s, *_ = step(s, a)
    plug_actor = env.obj_actors[-1][0]
    rs_ = np.asarray(root_state(env.model, s.sim))[:, plug_actor]
    socket_xy = np.array([0.0, env.obj_bias_y])
    lateral = np.linalg.norm(rs_[:, :2] - socket_xy, axis=-1)
    assert (lateral < 0.004).all(), f"plug drifted off the hole: {lateral}"
    # spawn center z = plate_top + ph/2; insertion drops it by several mm
    from isaacgymenv_tpu.envs.factory_nut_bolt_pick import TABLE_H

    ph = env.obj_actors[-1][1]
    spawn_z = env.obj_actors[-1][2] + ph / 2
    assert (rs_[:, 2] < spawn_z - 0.004).all(), (
        f"plug did not insert: z={rs_[:, 2]} spawn={spawn_z}"
    )
