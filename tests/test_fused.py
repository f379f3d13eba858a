"""Fused Pallas substep vs the XLA engine path: numerical equivalence.

The fused kernel (physics/fused.py) must reproduce engine._substep exactly
(same formulas, same order of ops — tolerances cover fp32 reassociation).
Runs in pallas interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.builder import ModelBuilder
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    DRIVE_POS,
    JT_FIXED,
    JT_FREE,
    JT_PRISMATIC,
    JT_REVOLUTE,
    SimState,
)

N = 128  # one lane-width of envs


def _quad_model():
    """Floating trunk + 2 revolute legs w/ foot spheres + prismatic slider +
    fixed sensor body: exercises every fast-path joint type, POS and EFFORT
    drives, limits, friction, armature, and ground contact."""
    mb = ModelBuilder()
    trunk = mb.add_body(
        "trunk", -1, JT_FREE, mass=5.0,
        inertia=np.diag([0.05, 0.07, 0.09]), com=(0.01, 0.0, -0.02),
    )
    mb.add_geom_sphere(trunk, (0.0, 0.0, -0.05), 0.06, friction=0.9)
    for side, y in (("l", 0.15), ("r", -0.15)):
        hip = mb.add_body(
            f"hip_{side}", trunk, JT_REVOLUTE, joint_pos=(0.1, y, 0.0),
            joint_axis=(0, 1, 0), mass=0.8, com=(0, 0, -0.12),
            inertia=np.diag([0.004, 0.004, 0.001]),
            drive_mode=DRIVE_POS, stiffness=60.0, damping=2.0,
            lower=-1.2, upper=1.2, has_limit=True, effort=40.0,
            armature=0.01, friction=0.05, maxvel=20.0,
        )
        foot = mb.add_body(
            f"foot_{side}", hip, JT_FIXED, joint_pos=(0.0, 0.0, -0.25),
            mass=0.1, inertia=np.diag([1e-4] * 3),
        )
        mb.add_geom_sphere(foot, (0.0, 0.0, 0.0), 0.03, friction=1.1)
    slider = mb.add_body(
        "slider", trunk, JT_PRISMATIC, joint_pos=(-0.1, 0.0, 0.05),
        joint_axis=(1, 0, 0), mass=0.3, com=(0.02, 0, 0),
        inertia=np.diag([2e-4, 3e-4, 3e-4]),
        drive_mode=DRIVE_EFFORT, lower=-0.2, upper=0.2, has_limit=True,
        effort=15.0, armature=0.002, friction=0.02, maxvel=5.0,
    )
    mb.add_geom_sphere(slider, (0.05, 0.0, 0.0), 0.02, friction=0.8)
    mb.add_force_sensor(1)  # hip_l: exercises the joint-wrench sensor path
    mb.add_force_sensor(2)  # foot_l (fixed joint)
    mb.gravity = np.array([0.0, 0.0, -9.81])
    return attach_effective_masses(mb.finalize())


def _rand_state(model, key, z0=0.45):
    kq, kv = jax.random.split(key)
    q0 = jnp.zeros((N, model.nq))
    q0 = q0.at[:, 2].set(z0 + 0.05 * jax.random.uniform(kq, (N,)))
    quat = jax.random.normal(kq, (N, 4)) * 0.1 + jnp.array([0, 0, 0, 1.0])
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q0 = q0.at[:, 3:7].set(quat)
    q0 = q0.at[:, 7:].set(0.3 * jax.random.normal(kq, (N, model.nq - 7)))
    qd0 = 0.5 * jax.random.normal(kv, (N, model.nv))
    return q0, qd0


def _empty_sim(model, q, qd):
    n, nb = q.shape[0], model.nb
    z3 = jnp.zeros((n, nb, 3))
    return SimState(
        q=q, qd=qd,
        body_pos=z3, body_quat=jnp.zeros((n, nb, 4)).at[..., 3].set(1.0),
        body_linvel=z3, body_angvel=z3,
        contact_force=z3, contact_torque=z3,
        dof_force=jnp.zeros((n, model.nd)),
    )


@pytest.mark.parametrize("substeps", [1, 4])
def test_fused_matches_engine(substeps, monkeypatch):
    model = _quad_model()
    key = jax.random.PRNGKey(0)
    q0, qd0 = _rand_state(model, key)
    sim0 = _empty_sim(model, q0, qd0)
    n = N
    ctrl = engine.Control.zero(model, n).replace(
        pos_target=0.4 * jax.random.normal(jax.random.fold_in(key, 1), (n, model.nd)),
        effort=5.0 * jax.random.normal(jax.random.fold_in(key, 2), (n, model.nd)),
    )
    dt = 0.02

    from isaacgymenv_tpu.physics import fused as fused_mod

    assert fused_mod.fused_ok(model, None, ctrl.body_wrench, n)

    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, None, sim0, ctrl, dt, substeps)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_FUSED", "1")
    out = engine.step(model, None, sim0, ctrl, dt, substeps)

    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.qd), np.asarray(ref.qd), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.dof_force), np.asarray(ref.dof_force), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.contact_force), np.asarray(ref.contact_force),
        rtol=2e-3, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out.body_pos), np.asarray(ref.body_pos), rtol=2e-4, atol=2e-4
    )
    assert out.joint_wrench is not None and ref.joint_wrench is not None
    np.testing.assert_allclose(
        np.asarray(out.joint_wrench), np.asarray(ref.joint_wrench),
        rtol=2e-3, atol=5e-2,
    )


def test_fused_gate_rejects_unsupported():
    from isaacgymenv_tpu.physics import fused as fused_mod

    model = _quad_model()
    ctrl = engine.Control.zero(model, N)
    # wrong env multiple
    assert not fused_mod.fused_ok(model, None, ctrl.body_wrench, 100)
    # DR-batched body mass is supported (mass input mode)
    batched = model.replace(
        body_mass=jnp.tile(jnp.asarray(model.body_mass), (N, 1))
    )
    assert fused_mod.fused_ok(batched, None, None, N)
    # 3-D (malformed) leaves fall back
    bad = model.replace(body_mass=jnp.zeros((2, N, model.nb)))
    assert not fused_mod.fused_ok(bad, None, None, N)
    # body wrench is supported (input mode)
    assert fused_mod.fused_ok(model, None, jnp.zeros((N, model.nb, 6)), N)


@pytest.mark.parametrize("substeps", [1, 2])
def test_fused_dr_batched_matches_engine(substeps, monkeypatch):
    """DR-batched per-env masses, dof gains/limits, and gravity as kernel
    inputs — the fast path with domain randomization ON must match the XLA
    path on the SAME batched model."""
    model = _quad_model()
    n = N
    key = jax.random.PRNGKey(11)
    # per-env scale factors like DomainRandomizer.resample produces
    m_scale = 0.5 + jax.random.uniform(key, (n, 1))
    kp_scale = 0.75 + 0.5 * jax.random.uniform(jax.random.fold_in(key, 1), (n, 1))
    lim_shift = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (n, 1))
    grav = jnp.asarray([0.0, 0.0, -9.81]) + 0.5 * jax.random.normal(
        jax.random.fold_in(key, 3), (n, 3)
    )
    batched = model.replace(
        body_mass=jnp.asarray(model.body_mass) * m_scale,
        geom_meff=jnp.asarray(model.geom_meff) * m_scale[:, :1],
        dof_stiffness=jnp.asarray(model.dof_stiffness) * kp_scale,
        dof_damping=jnp.asarray(model.dof_damping) * kp_scale,
        dof_lower=jnp.asarray(model.dof_lower) + lim_shift,
        dof_upper=jnp.asarray(model.dof_upper) + lim_shift,
        gravity=grav,
    )
    from isaacgymenv_tpu.physics import fused as fused_mod

    assert fused_mod.fused_ok(batched, None, None, n)

    q0, qd0 = _rand_state(batched, jax.random.fold_in(key, 4))
    sim0 = _empty_sim(batched, q0, qd0)
    ctrl = engine.Control.zero(batched, n).replace(
        pos_target=0.4 * jax.random.normal(jax.random.fold_in(key, 5), (n, model.nd)),
        effort=5.0 * jax.random.normal(jax.random.fold_in(key, 6), (n, model.nd)),
    )
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(batched, None, sim0, ctrl, 0.02, substeps)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_FUSED", "1")
    out = engine.step(batched, None, sim0, ctrl, 0.02, substeps)

    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.qd), np.asarray(ref.qd), rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out.dof_force), np.asarray(ref.dof_force), rtol=2e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.contact_force), np.asarray(ref.contact_force),
        rtol=2e-3, atol=5e-2,
    )


@pytest.mark.parametrize("substeps,bumpy", [(1, True), (4, False)])
def test_fused_terrain_wrench_friction_matches_engine(substeps, bumpy, monkeypatch):
    """Terrain heights/normals, external wrenches, and per-env friction as
    kernel inputs.  substeps=1: heights are sampled at identical positions
    in both paths, so even a bumpy heightfield must match exactly.
    substeps>1 uses a constant-height field (per-substep lookup == held)."""
    from isaacgymenv_tpu.physics import fused as fused_mod
    from isaacgymenv_tpu.physics.contact import Heightfield

    model = _quad_model()
    n = N
    # per-env friction buckets (fric_mode)
    fric = jnp.tile(
        jnp.linspace(0.4, 1.2, n)[:, None], (1, model.ng)
    )
    model = model.replace(geom_friction=fric)

    key = jax.random.PRNGKey(3)
    q0, qd0 = _rand_state(model, key, z0=0.5)
    # refresh pose caches: the fused path samples terrain heights at the
    # cached geom positions (always fresh in the env flow)
    sim0 = engine.forward(model, None, _empty_sim(model, q0, qd0))
    heights = (
        0.05 * jnp.sin(jnp.arange(64.0))[:, None] * jnp.cos(jnp.arange(64.0))[None, :]
        if bumpy else jnp.full((64, 64), 0.07)
    )
    terrain = Heightfield(heights=heights, hscale=0.3, border_x=-9.0, border_y=-9.0)
    wrench = 2.0 * jax.random.normal(jax.random.fold_in(key, 5), (n, model.nb, 6))
    ctrl = engine.Control.zero(model, n).replace(
        pos_target=0.3 * jax.random.normal(jax.random.fold_in(key, 1), (n, model.nd)),
        effort=4.0 * jax.random.normal(jax.random.fold_in(key, 2), (n, model.nd)),
        body_wrench=wrench,
    )
    assert fused_mod.fused_ok(model, terrain, ctrl.body_wrench, n)

    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, terrain, sim0, ctrl, 0.02, substeps)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_FUSED", "1")
    out = engine.step(model, terrain, sim0, ctrl, 0.02, substeps)

    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.qd), np.asarray(ref.qd), rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out.contact_force), np.asarray(ref.contact_force),
        rtol=2e-3, atol=5e-2,
    )


@pytest.mark.parametrize("substeps", [1, 2])
def test_fused_pairs_anchors_tendons_gravcomp(substeps, monkeypatch):
    """Full-scene features in the fused kernel: body-vs-body pair contacts
    (box + cylinder + capsule + sphere surfaces), world anchors, fixed
    tendons, and per-body gravity compensation — vs the XLA path.

    substeps=2 exercises the multi-substep carry (same structural coverage
    as 4 at half the interpret-mode cost: the 4x-unrolled variant takes
    >40 min on this CI host)."""
    from isaacgymenv_tpu.physics import fused as fused_mod
    from isaacgymenv_tpu.physics.builder import ModelBuilder

    mb = ModelBuilder()
    # actor 0: 2-dof "hand" with tendon-coupled joints + finger sphere geoms
    base = mb.add_body("base", -1, JT_FREE, mass=1.5,
                       inertia=np.diag([0.01, 0.012, 0.014]), com=(0, 0, 0.01),
                       gravcomp=1.0)
    j1 = mb.add_body("j1", base, JT_REVOLUTE, joint_pos=(0.08, 0, 0),
                     joint_axis=(0, 1, 0), joint_name="j1", mass=0.2,
                     com=(0, 0, -0.05), inertia=np.diag([4e-4] * 3),
                     drive_mode=DRIVE_POS, stiffness=20.0, damping=0.5,
                     lower=-1.0, upper=1.0, has_limit=True, effort=10.0,
                     armature=0.001, maxvel=20.0)
    j2 = mb.add_body("j2", j1, JT_REVOLUTE, joint_pos=(0, 0, -0.1),
                     joint_axis=(0, 1, 0), joint_name="j2", mass=0.1,
                     com=(0, 0, -0.04), inertia=np.diag([2e-4] * 3),
                     drive_mode=DRIVE_POS, stiffness=10.0, damping=0.3,
                     lower=-1.0, upper=1.0, has_limit=True, effort=8.0,
                     armature=0.001, maxvel=20.0)
    mb.add_geom_sphere(j2, (0.0, 0.0, -0.08), 0.02, friction=1.0)
    mb.add_geom_sphere(base, (0.0, 0.05, 0.0), 0.03, friction=0.8)
    mb.add_tendon(["j1", "j2"], [1.0, -1.0], -0.4, 0.4, k=25.0, d=0.2)
    mb.add_anchor(base, offset=(0.0, 0.0, 0.02), target=(0.0, 0.0, 0.45))

    # actor 1: free "object" with every surface kind
    obj = ModelBuilder()
    ob = obj.add_body("obj", -1, JT_FREE, mass=0.3,
                      inertia=np.diag([3e-4, 3e-4, 3e-4]), com=(0, 0, 0))
    obj.add_surface(ob, ModelBuilder.SURF_BOX, (0, 0, 0), None, (0.04, 0.04, 0.04), 0.9)
    obj.add_surface(ob, ModelBuilder.SURF_SPHERE, (0.0, 0.0, 0.06), None, (0.02, 0, 0), 0.9)
    obj.add_surface(ob, ModelBuilder.SURF_CYLINDER, (0.06, 0, 0), None, (0.02, 0.03, 0), 0.9)
    obj.add_surface(ob, ModelBuilder.SURF_CAPSULE, (-0.06, 0, 0), None, (0.015, 0.02, 0), 0.9)
    obj.add_geom_sphere(ob, (0, 0, -0.04), 0.015, friction=0.9)
    mb.merge(obj)
    mb.gravity = np.array([0.0, 0.0, -9.81])
    model = attach_effective_masses(mb.finalize())
    assert model.n_pairs > 0 and model.anchor_body and model.tendon_dof

    n = N
    key = jax.random.PRNGKey(9)
    nq = model.nq
    q0 = jnp.zeros((n, nq))
    # hand base near the anchor, object right below the fingertip
    q0 = q0.at[:, 2].set(0.42 + 0.02 * jax.random.uniform(key, (n,)))
    q0 = q0.at[:, 6].set(1.0)
    q0 = q0.at[:, 7:9].set(0.5 * jax.random.normal(jax.random.fold_in(key, 1), (n, 2)))
    qa_obj = model.q_adr[model.actor_root[1]]
    q0 = q0.at[:, qa_obj + 0].set(0.08)
    q0 = q0.at[:, qa_obj + 2].set(
        0.2 + 0.02 * jax.random.uniform(jax.random.fold_in(key, 2), (n,))
    )
    q0 = q0.at[:, qa_obj + 6].set(1.0)
    qd0 = 0.3 * jax.random.normal(jax.random.fold_in(key, 3), (n, model.nv))
    sim0 = engine.forward(model, None, _empty_sim(model, q0, qd0))
    ctrl = engine.Control.zero(model, n).replace(
        pos_target=0.4 * jax.random.normal(jax.random.fold_in(key, 4), (n, model.nd)),
    )
    assert fused_mod.fused_ok(model, None, ctrl.body_wrench, n)

    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, None, sim0, ctrl, 0.02, substeps)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_FUSED", "1")
    out = engine.step(model, None, sim0, ctrl, 0.02, substeps)

    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.qd), np.asarray(ref.qd), rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(out.contact_force), np.asarray(ref.contact_force),
        rtol=2e-3, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out.contact_torque), np.asarray(ref.contact_torque),
        rtol=2e-3, atol=5e-2,
    )


def test_fused_static_body_geom(monkeypatch):
    """Geoms on a fully static kinematic chain (fixed root, e.g. Cartpole's
    rail) trace as Python-float geometry inside the kernel; regression for
    the `'bool' object has no attribute 'astype'` crash in the live
    contact-count pass (only reachable at num_envs % 128 == 0, which CI's
    small-env smoke tests never hit)."""
    from isaacgymenv_tpu.physics import fused as fused_mod

    mb = ModelBuilder()
    # static root: fixed joint to world, with a geom that PENETRATES the
    # ground (constant active contact) and one that never touches it
    table = mb.add_body("table", -1, JT_FIXED, mass=10.0,
                        inertia=np.diag([0.1, 0.1, 0.1]))
    mb.add_geom_sphere(table, (0.3, 0.0, 0.02), 0.05, friction=0.8)  # active
    mb.add_geom_sphere(table, (0.0, 0.0, 0.5), 0.05, friction=0.8)   # inactive
    paddle = mb.add_body("paddle", table, JT_REVOLUTE, joint_pos=(0, 0, 0.2),
                         joint_axis=(0, 1, 0), mass=0.3,
                         inertia=np.diag([1e-3] * 3), drive_mode=DRIVE_POS,
                         stiffness=10.0, damping=0.5, lower=-1.0, upper=1.0,
                         has_limit=True, effort=5.0, armature=1e-3, maxvel=10.0)
    mb.add_geom_sphere(paddle, (0.0, 0.0, -0.1), 0.02, friction=0.9)
    actor2 = ModelBuilder()
    ball = actor2.add_body("ball", -1, JT_FREE, mass=0.2,
                           inertia=np.diag([1e-3] * 3))
    actor2.add_geom_sphere(ball, (0.0, 0.0, 0.0), 0.04, friction=1.0)
    mb.merge(actor2)
    mb.gravity = np.array([0.0, 0.0, -9.81])
    model = attach_effective_masses(mb.finalize())

    qa = model.q_adr[model.actor_root[1]]  # ball free joint
    q0 = jnp.zeros((N, model.nq))
    q0 = q0.at[:, qa + 2].set(
        0.03 + 0.02 * jax.random.uniform(jax.random.PRNGKey(3), (N,))
    )
    q0 = q0.at[:, qa + 6].set(1.0)
    qd0 = 0.2 * jax.random.normal(jax.random.PRNGKey(4), (N, model.nv))
    sim0 = _empty_sim(model, q0, qd0)
    ctrl = engine.Control.zero(model, N).replace(
        pos_target=0.5 * jax.random.normal(jax.random.PRNGKey(5), (N, model.nd)),
    )
    assert fused_mod.fused_ok(model, None, ctrl.body_wrench, N)

    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, None, sim0, ctrl, 0.02, 2)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_FUSED", "1")
    out = engine.step(model, None, sim0, ctrl, 0.02, 2)

    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.qd), np.asarray(ref.qd), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.contact_force), np.asarray(ref.contact_force),
        rtol=2e-3, atol=2e-2,
    )


def test_fused_slim_pairs_matches_engine(monkeypatch):
    """Slim pair-cache schedule (ISAACGYMENV_TPU_FUSED_SLIM=1 — the
    big-pair-scene VMEM rescue, VERDICT r4 #2): pass 2 re-derives the
    surface query instead of caching it; results must match the XLA path
    exactly like the cache-mode kernel."""
    from isaacgymenv_tpu.physics import fused as fused_mod
    from isaacgymenv_tpu.physics.builder import ModelBuilder

    mb = ModelBuilder()
    base = mb.add_body("base", -1, JT_FREE, mass=1.5,
                       inertia=np.diag([0.01, 0.012, 0.014]), com=(0, 0, 0.01))
    j1 = mb.add_body("j1", base, JT_REVOLUTE, joint_pos=(0.08, 0, 0),
                     joint_axis=(0, 1, 0), joint_name="j1", mass=0.2,
                     com=(0, 0, -0.05), inertia=np.diag([4e-4] * 3),
                     drive_mode=DRIVE_POS, stiffness=20.0, damping=0.5,
                     lower=-1.0, upper=1.0, has_limit=True, effort=10.0,
                     armature=0.001, maxvel=20.0)
    mb.add_geom_sphere(j1, (0.0, 0.0, -0.08), 0.02, friction=1.0)
    mb.add_geom_sphere(base, (0.0, 0.05, 0.0), 0.03, friction=0.8)
    obj = ModelBuilder()
    ob = obj.add_body("obj", -1, JT_FREE, mass=0.3,
                      inertia=np.diag([3e-4, 3e-4, 3e-4]), com=(0, 0, 0))
    obj.add_surface(ob, ModelBuilder.SURF_BOX, (0, 0, 0), None, (0.04, 0.04, 0.04), 0.9)
    obj.add_surface(ob, ModelBuilder.SURF_CAPSULE, (-0.06, 0, 0), None, (0.015, 0.02, 0), 0.9)
    obj.add_geom_sphere(ob, (0, 0, -0.04), 0.015, friction=0.9)
    mb.merge(obj)
    mb.gravity = np.array([0.0, 0.0, -9.81])
    model = attach_effective_masses(mb.finalize())
    assert model.n_pairs > 0

    n = N
    key = jax.random.PRNGKey(7)
    q0 = jnp.zeros((n, model.nq))
    q0 = q0.at[:, 2].set(0.3 + 0.02 * jax.random.uniform(key, (n,)))
    q0 = q0.at[:, 6].set(1.0)
    qa_obj = model.q_adr[model.actor_root[1]]
    q0 = q0.at[:, qa_obj + 2].set(
        0.2 + 0.02 * jax.random.uniform(jax.random.fold_in(key, 2), (n,))
    )
    q0 = q0.at[:, qa_obj + 6].set(1.0)
    qd0 = 0.3 * jax.random.normal(jax.random.fold_in(key, 3), (n, model.nv))
    sim0 = engine.forward(model, None, _empty_sim(model, q0, qd0))
    ctrl = engine.Control.zero(model, n).replace(
        pos_target=0.4 * jax.random.normal(jax.random.fold_in(key, 4), (n, model.nd)),
    )
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, None, sim0, ctrl, 0.02, 2)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_FUSED", "1")
    monkeypatch.setenv("ISAACGYMENV_TPU_FUSED_SLIM", "1")
    out = engine.step(model, None, sim0, ctrl, 0.02, 2)

    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.qd), np.asarray(ref.qd), rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(out.contact_force), np.asarray(ref.contact_force),
        rtol=2e-3, atol=5e-2,
    )


def test_fused_no_ground_matches_engine(monkeypatch):
    """no_ground scenes (fixed-base manipulation; SimModel.no_ground) skip
    the ground pass in BOTH paths and keep pair contacts equivalent."""
    from isaacgymenv_tpu.physics import fused as fused_mod
    from isaacgymenv_tpu.physics.builder import ModelBuilder

    mb = ModelBuilder()
    base = mb.add_body("base", -1, JT_FIXED, mass=2.0,
                       inertia=np.diag([0.01] * 3), joint_pos=(0, 0, 0.5))
    f1 = mb.add_body("f1", base, JT_REVOLUTE, joint_pos=(0.05, 0, 0),
                     joint_axis=(0, 1, 0), joint_name="f1", mass=0.1,
                     com=(0, 0, -0.04), inertia=np.diag([2e-4] * 3),
                     drive_mode=DRIVE_POS, stiffness=5.0, damping=0.2,
                     lower=-1.2, upper=1.2, has_limit=True, effort=4.0,
                     armature=0.001, maxvel=20.0)
    mb.add_geom_sphere(f1, (0.0, 0.0, -0.08), 0.02, friction=1.0)
    obj = ModelBuilder()
    ob = obj.add_body("obj", -1, JT_FREE, mass=0.2,
                      inertia=np.diag([2e-4] * 3), com=(0, 0, 0))
    obj.add_surface(ob, ModelBuilder.SURF_BOX, (0, 0, 0), None, (0.03,) * 3, 0.9)
    obj.add_geom_sphere(ob, (0, 0, -0.03), 0.01, friction=0.9)
    mb.merge(obj)
    mb.gravity = np.array([0.0, 0.0, -9.81])
    mb.no_ground = True
    model = attach_effective_masses(mb.finalize())
    assert model.no_ground and model.n_pairs > 0

    n = N
    key = jax.random.PRNGKey(13)
    q0 = jnp.zeros((n, model.nq))
    qa_obj = model.q_adr[model.actor_root[1]]
    q0 = q0.at[:, qa_obj + 0].set(0.05)
    q0 = q0.at[:, qa_obj + 2].set(0.40 + 0.01 * jax.random.uniform(key, (n,)))
    q0 = q0.at[:, qa_obj + 6].set(1.0)
    qd0 = 0.2 * jax.random.normal(jax.random.fold_in(key, 1), (n, model.nv))
    sim0 = engine.forward(model, None, _empty_sim(model, q0, qd0))
    ctrl = engine.Control.zero(model, n).replace(
        pos_target=0.5 * jax.random.normal(jax.random.fold_in(key, 2), (n, model.nd)),
    )
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, None, sim0, ctrl, 0.02, 2)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_FUSED", "1")
    out = engine.step(model, None, sim0, ctrl, 0.02, 2)

    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.qd), np.asarray(ref.qd), rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(out.contact_force), np.asarray(ref.contact_force),
        rtol=2e-3, atol=5e-2,
    )
    # ground slip must pass through unchanged (never evolves)
    assert out.slip_g is not None
    np.testing.assert_allclose(np.asarray(out.slip_g), 0.0)
