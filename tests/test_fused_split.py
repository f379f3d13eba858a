"""Split fused substep (contacts + dynamics kernels) vs the XLA engine.

physics/fused_split.py serves scenes whose live-register set exceeds the
monolithic kernel's VMEM wall (ShadowHand's 256 pairs, UsefulHound's
21-body chain).  It must reproduce engine._substep exactly like the
monolith does; these tests drive it in pallas interpret mode on CPU via
ISAACGYMENV_TPU_FORCE_SPLIT.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.builder import ModelBuilder
from isaacgymenv_tpu.physics.meff import attach_effective_masses
from isaacgymenv_tpu.physics.types import (
    DRIVE_POS,
    JT_FIXED,
    JT_FREE,
    JT_REVOLUTE,
)

from tests.test_fused import N, _empty_sim, _quad_model, _rand_state


def _pair_scene():
    """Hand-with-tendon + every-surface-kind object + anchor + gravcomp:
    the same full-feature scene as test_fused's pair test."""
    mb = ModelBuilder()
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
    obj = ModelBuilder()
    ob = obj.add_body("obj", -1, JT_FREE, mass=0.3,
                      inertia=np.diag([3e-4, 3e-4, 3e-4]), com=(0, 0, 0))
    obj.add_surface(ob, ModelBuilder.SURF_BOX, (0, 0, 0), None,
                    (0.04, 0.04, 0.04), 0.9)
    obj.add_surface(ob, ModelBuilder.SURF_SPHERE, (0.0, 0.0, 0.06), None,
                    (0.02, 0, 0), 0.9)
    obj.add_surface(ob, ModelBuilder.SURF_CYLINDER, (0.06, 0, 0), None,
                    (0.02, 0.03, 0), 0.9)
    obj.add_surface(ob, ModelBuilder.SURF_CAPSULE, (-0.06, 0, 0), None,
                    (0.015, 0.02, 0), 0.9)
    obj.add_geom_sphere(ob, (0, 0, -0.04), 0.015, friction=0.9)
    mb.merge(obj)
    mb.gravity = np.array([0.0, 0.0, -9.81])
    return attach_effective_masses(mb.finalize())


def _pair_state_ctrl(model, key):
    n = N
    q0 = jnp.zeros((n, model.nq))
    q0 = q0.at[:, 2].set(0.42 + 0.02 * jax.random.uniform(key, (n,)))
    q0 = q0.at[:, 6].set(1.0)
    q0 = q0.at[:, 7:9].set(
        0.5 * jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    )
    qa_obj = model.q_adr[model.actor_root[1]]
    q0 = q0.at[:, qa_obj + 0].set(0.08)
    q0 = q0.at[:, qa_obj + 2].set(
        0.2 + 0.02 * jax.random.uniform(jax.random.fold_in(key, 2), (n,))
    )
    q0 = q0.at[:, qa_obj + 6].set(1.0)
    qd0 = 0.3 * jax.random.normal(jax.random.fold_in(key, 3), (n, model.nv))
    sim0 = engine.forward(model, None, _empty_sim(model, q0, qd0))
    ctrl = engine.Control.zero(model, n).replace(
        pos_target=0.4 * jax.random.normal(
            jax.random.fold_in(key, 4), (n, model.nd)
        ),
    )
    return sim0, ctrl


def _compare(out, ref, wrench=True):
    np.testing.assert_allclose(
        np.asarray(out.q), np.asarray(ref.q), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.qd), np.asarray(ref.qd), rtol=2e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.dof_force), np.asarray(ref.dof_force),
        rtol=2e-3, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out.contact_force), np.asarray(ref.contact_force),
        rtol=2e-3, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out.contact_torque), np.asarray(ref.contact_torque),
        rtol=2e-3, atol=5e-2,
    )
    if wrench and ref.joint_wrench is not None:
        np.testing.assert_allclose(
            np.asarray(out.joint_wrench), np.asarray(ref.joint_wrench),
            rtol=2e-3, atol=5e-2,
        )


@pytest.mark.parametrize("substeps", [1, 2])
def test_split_matches_engine_ground(substeps, monkeypatch):
    """Ground contacts + every joint type + sensors on the quad model."""
    model = _quad_model()
    q0, qd0 = _rand_state(model, jax.random.PRNGKey(0))
    sim0 = _empty_sim(model, q0, qd0)
    ctrl = engine.Control.zero(model, N).replace(
        pos_target=0.4 * jax.random.normal(
            jax.random.PRNGKey(1), (N, model.nd)
        ),
        effort=5.0 * jax.random.normal(jax.random.PRNGKey(2), (N, model.nd)),
    )
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, None, sim0, ctrl, 0.02, substeps)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_SPLIT", "1")
    out = engine.step(model, None, sim0, ctrl, 0.02, substeps)
    _compare(out, ref)


def test_split_matches_engine_pairs(monkeypatch):
    """The rolled pair loop: every surface kind + anchors + tendons +
    gravcomp, vs the XLA path — the ShadowHand-class code path."""
    model = _pair_scene()
    assert model.n_pairs > 0 and model.anchor_body and model.tendon_dof
    sim0, ctrl = _pair_state_ctrl(model, jax.random.PRNGKey(9))
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, None, sim0, ctrl, 0.02, 2)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_SPLIT", "1")
    out = engine.step(model, None, sim0, ctrl, 0.02, 2)
    _compare(out, ref, wrench=False)
    # carried stiction state must match too (grasp stability depends on it)
    np.testing.assert_allclose(
        np.asarray(out.slip_p), np.asarray(ref.slip_p), rtol=2e-3, atol=1e-5
    )


def test_split_dr_modes_match_engine(monkeypatch):
    """DR-batched masses / dof gains / gravity / per-env friction as
    kernel inputs on the split path (mass_mode reaches the rolled pair
    loop's dynamic effective-mass reads)."""
    model = _pair_scene()
    n = N
    key = jax.random.PRNGKey(21)
    model = model.replace(
        body_mass=jnp.asarray(model.body_mass)[None, :]
        * (1.0 + 0.2 * jax.random.uniform(key, (n, model.nb))),
        geom_meff=jnp.asarray(model.geom_meff)[None, :]
        * (1.0 + 0.2 * jax.random.uniform(key, (n, model.ng))),
        geom_friction=jnp.asarray(model.geom_friction)[None, :]
        * (1.0 + 0.3 * jax.random.uniform(jax.random.fold_in(key, 1),
                                          (n, model.ng))),
        gravity=jnp.asarray(model.gravity)[None, :]
        * (1.0 + 0.1 * jax.random.uniform(jax.random.fold_in(key, 2), (n, 1))),
    )
    sim0, ctrl = _pair_state_ctrl(model, jax.random.fold_in(key, 3))
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, None, sim0, ctrl, 0.02, 2)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_SPLIT", "1")
    out = engine.step(model, None, sim0, ctrl, 0.02, 2)
    _compare(out, ref, wrench=False)


def test_split_no_ground_matches_engine(monkeypatch):
    """no_ground manipulation scene: the ground pass and its slip state
    vanish from the contacts kernel; pair contacts stay equivalent."""
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

    key = jax.random.PRNGKey(13)
    q0 = jnp.zeros((N, model.nq))
    qa_obj = model.q_adr[model.actor_root[1]]
    q0 = q0.at[:, qa_obj + 0].set(0.05)
    q0 = q0.at[:, qa_obj + 2].set(0.40 + 0.01 * jax.random.uniform(key, (N,)))
    q0 = q0.at[:, qa_obj + 6].set(1.0)
    qd0 = 0.2 * jax.random.normal(jax.random.fold_in(key, 1), (N, model.nv))
    sim0 = engine.forward(model, None, _empty_sim(model, q0, qd0))
    ctrl = engine.Control.zero(model, N).replace(
        pos_target=0.5 * jax.random.normal(
            jax.random.fold_in(key, 2), (N, model.nd)
        ),
    )
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "1")
    ref = engine.step(model, None, sim0, ctrl, 0.02, 2)
    monkeypatch.setenv("ISAACGYMENV_TPU_NO_FUSED", "")
    monkeypatch.setenv("ISAACGYMENV_TPU_FORCE_SPLIT", "1")
    out = engine.step(model, None, sim0, ctrl, 0.02, 2)
    _compare(out, ref, wrench=False)


def test_dispatch_prefers_mono_then_split():
    """_use_fused routes: small scene -> mono; big-register scene (VMEM
    budget shrunk) -> split; structurally unsupported -> None."""
    import os

    model = _quad_model()
    ctrl = engine.Control.zero(model, N)
    sim = _empty_sim(model, jnp.zeros((N, model.nq)), jnp.zeros((N, model.nv)))
    os.environ["ISAACGYMENV_TPU_FORCE_FUSED"] = "1"
    try:
        assert engine._use_fused(model, None, ctrl, sim) == "mono"
        # starve the monolith's budget: the split path takes over
        os.environ["ISAACGYMENV_TPU_FUSED_VMEM_BUDGET"] = "1024"
        assert engine._use_fused(model, None, ctrl, sim) == "split"
        # starve the split budget too: back to the XLA path
        os.environ["ISAACGYMENV_TPU_SPLIT_VMEM_BUDGET"] = "1024"
        assert engine._use_fused(model, None, ctrl, sim) is None
    finally:
        os.environ.pop("ISAACGYMENV_TPU_FORCE_FUSED", None)
        os.environ.pop("ISAACGYMENV_TPU_FUSED_VMEM_BUDGET", None)
        os.environ.pop("ISAACGYMENV_TPU_SPLIT_VMEM_BUDGET", None)
