"""Physics-core validation against analytic mechanics.

These are the fidelity-gate unit tests the reference never had
(SURVEY.md §4): pendulum frequency, double-pendulum energy conservation,
free-fall, spinning-top gyroscopic precession, mass-matrix symmetry.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isaacgymenv_tpu.physics import dynamics, engine, kinematics
from isaacgymenv_tpu.physics.builder import ModelBuilder, box_inertia, sphere_inertia
from isaacgymenv_tpu.physics.types import (
    JT_FIXED,
    JT_FREE,
    JT_PRISMATIC,
    JT_REVOLUTE,
    SimModel,
    make_zero_state,
)


def make_pendulum(length=1.0, mass=1.0, point_mass=True):
    """Fixed-base pendulum rotating about world y, COM at -z distance `length`."""
    mb = ModelBuilder()
    base = mb.add_body("base", -1, JT_FIXED)
    inertia = np.zeros((3, 3)) if point_mass else box_inertia(mass, 0.05, 0.05, length)
    mb.add_body(
        "rod",
        base,
        JT_REVOLUTE,
        joint_axis=(0, 1, 0),
        mass=mass,
        com=(0, 0, -length),
        inertia=inertia,
    )
    return mb.finalize()


def test_pendulum_small_oscillation_frequency():
    L = 1.0
    model = make_pendulum(length=L)
    state = make_zero_state(model, 1)
    theta0 = 0.02
    state = state.replace(q=state.q.at[:, 0].set(theta0))

    dt = 1e-3
    n = 4000

    @jax.jit
    def rollout(state):
        ctrl = engine.Control.zero(model, 1)

        def body(s, _):
            s = engine.step(model, None, s, ctrl, dt, substeps=1)
            return s, s.q[0, 0]

        return jax.lax.scan(body, state, None, length=n)

    _, thetas = rollout(state)
    thetas = np.asarray(thetas)
    # count zero crossings to estimate period; omega = sqrt(g/L)
    crossings = np.where(np.diff(np.sign(thetas)) != 0)[0]
    assert len(crossings) >= 3
    half_period = np.mean(np.diff(crossings)) * dt
    omega_meas = np.pi / half_period
    omega_true = np.sqrt(9.81 / L)
    np.testing.assert_allclose(omega_meas, omega_true, rtol=0.02)


def test_pendulum_equilibrium_torque():
    """Static bias torque at horizontal = m g L."""
    model = make_pendulum(length=1.0, mass=2.0)
    q = jnp.array([[np.pi / 2]])  # horizontal
    qd = jnp.zeros((1, 1))
    kin = kinematics.fk(model, q, qd)
    inertias = dynamics.body_spatial_inertias(model, (1,), jnp.float32)
    C = dynamics.rnea_bias(model, kin, inertias, None)
    np.testing.assert_allclose(float(jnp.abs(C[0, 0])), 2.0 * 9.81 * 1.0, rtol=1e-4)


def make_double_pendulum():
    mb = ModelBuilder()
    base = mb.add_body("base", -1, JT_FIXED)
    b1 = mb.add_body(
        "link1", base, JT_REVOLUTE, joint_axis=(0, 1, 0),
        mass=1.0, com=(0, 0, -0.5), inertia=box_inertia(1.0, 0.05, 0.05, 1.0),
    )
    mb.add_body(
        "link2", b1, JT_REVOLUTE, joint_pos=(0, 0, -1.0), joint_axis=(0, 1, 0),
        mass=1.0, com=(0, 0, -0.5), inertia=box_inertia(1.0, 0.05, 0.05, 1.0),
    )
    return mb.finalize()


def total_energy_double_pendulum(model, state):
    kin = kinematics.fk(model, state.q, state.qd)
    inertias = dynamics.body_spatial_inertias(model, (state.q.shape[0],), jnp.float32)
    M = dynamics.crba(model, kin, inertias)
    ke = 0.5 * jnp.einsum("ni,nij,nj->n", state.qd, M, state.qd)
    pe = 0.0
    for i in range(model.nb):
        com_w = kin.p_w[i] + jnp.einsum("nij,j->ni", kin.R_w[i], model.body_com[i])
        pe += model.body_mass[i] * 9.81 * com_w[:, 2]
    return ke + pe


def test_double_pendulum_energy_conservation():
    model = make_double_pendulum()
    state = make_zero_state(model, 1)
    state = state.replace(q=jnp.array([[1.2, 0.4]]))
    e0 = float(total_energy_double_pendulum(model, state)[0])

    dt = 5e-4
    ctrl = engine.Control.zero(model, 1)

    @jax.jit
    def run(s):
        def body(s, _):
            return engine.step(model, None, s, ctrl, dt, substeps=1), None
        s, _ = jax.lax.scan(body, s, None, length=4000)
        return s

    state = run(state)
    e1 = float(total_energy_double_pendulum(model, state)[0])
    # semi-implicit Euler at dt=5e-4 over 2s: expect < 1% drift
    assert abs(e1 - e0) < 0.01 * abs(e0) + 0.01


def make_free_ball(radius=0.1, mass=1.0):
    mb = ModelBuilder()
    b = mb.add_body("ball", -1, JT_FREE, mass=mass, inertia=sphere_inertia(mass, radius))
    mb.add_geom_sphere(b, (0, 0, 0), radius, friction=1.0)
    mb.contact_stiffness = 5000.0
    mb.contact_damping = 5.0e4  # Hunt-Crossley: damper = kd * depth
    return mb.finalize()


def test_free_fall():
    model = make_free_ball()
    state = make_zero_state(model, 4)
    state = state.replace(q=state.q.at[:, 2].set(5.0))  # z = 5
    dt = 0.01
    ctrl = engine.Control.zero(model, 4)

    @jax.jit
    def run(s):
        def body(s, _):
            return engine.step(model, None, s, ctrl, dt, substeps=1), None
        s, _ = jax.lax.scan(body, s, None, length=100)
        return s

    state = run(state)  # t = 1s
    z_expect = 5.0 - 0.5 * 9.81  # plus O(dt) integrator bias
    np.testing.assert_allclose(np.asarray(state.q[:, 2]), z_expect, atol=0.06)
    np.testing.assert_allclose(np.asarray(state.qd[:, 3:6])[:, 2], -9.81, atol=1e-3)
    # caches populated
    np.testing.assert_allclose(np.asarray(state.body_pos[:, 0, 2]), z_expect, atol=0.06)


def test_ball_rests_on_ground():
    model = make_free_ball(radius=0.2, mass=1.0)
    state = make_zero_state(model, 2)
    state = state.replace(q=state.q.at[:, 2].set(0.5))
    dt = 0.005
    ctrl = engine.Control.zero(model, 2)

    @jax.jit
    def run(s):
        def body(s, _):
            return engine.step(model, None, s, ctrl, dt, substeps=2), None
        s, _ = jax.lax.scan(body, s, None, length=600)
        return s

    state = run(state)  # 3 s — should have settled
    z = float(state.q[0, 2])
    # rest height ~ radius - mg/kn = 0.2 - 9.81/5000
    assert abs(z - (0.2 - 9.81 / 5000.0)) < 0.02, z
    assert abs(float(state.qd[0, 5])) < 0.05  # nearly static
    # contact force ~ weight
    fz = float(state.contact_force[0, 0, 2])
    np.testing.assert_allclose(fz, 9.81, rtol=0.2)


def test_mass_matrix_symmetric_posdef():
    model = make_double_pendulum()
    rng = np.random.default_rng(0)
    q = jnp.array(rng.uniform(-2, 2, size=(8, 2)), jnp.float32)
    qd = jnp.zeros((8, 2))
    kin = kinematics.fk(model, q, qd)
    M = np.asarray(dynamics.mass_matrix(model, kin))
    np.testing.assert_allclose(M, np.swapaxes(M, -1, -2), atol=1e-5)
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_prismatic_gravity():
    """Vertical slider under gravity accelerates at -g."""
    mb = ModelBuilder()
    base = mb.add_body("base", -1, JT_FIXED)
    mb.add_body("slide", base, JT_PRISMATIC, joint_axis=(0, 0, 1), mass=3.0)
    model = mb.finalize()
    state = make_zero_state(model, 1)
    kin = kinematics.fk(model, state.q, state.qd)
    qdd = dynamics.forward_dynamics(model, kin, jnp.zeros((1, 1)))
    np.testing.assert_allclose(float(qdd[0, 0]), -9.81, rtol=1e-5)


def test_torque_free_euler_equations():
    """Tumbling asymmetric body: body-frame omega follows Euler's equations.

    Validates the gyroscopic (v x* I v) bias term by comparing against a
    scipy ODE integration of  I w_dot = (I w) x w  (zero gravity).
    """
    from scipy.integrate import solve_ivp

    I_diag = np.array([0.05, 0.09, 0.02])
    mb = ModelBuilder()
    mb.add_body("body", -1, JT_FREE, mass=1.0, inertia=np.diag(I_diag))
    mb.gravity = np.zeros(3)
    model = mb.finalize()

    w0 = np.array([0.5, 4.0, 0.8])  # near the unstable middle axis
    state = make_zero_state(model, 1)
    state = state.replace(qd=state.qd.at[0, 0:3].set(jnp.array(w0, jnp.float32)))

    dt = 1e-4
    T = 1.0
    ctrl = engine.Control.zero(model, 1)

    @jax.jit
    def run(s):
        def body(s, _):
            return engine.step(model, None, s, ctrl, dt, substeps=1), None
        s, _ = jax.lax.scan(body, s, None, length=int(T / dt))
        return s

    w_sim = np.asarray(run(state).qd[0, 0:3])

    def euler_rhs(t, w):
        return np.cross(I_diag * w, w) / I_diag

    sol = solve_ivp(euler_rhs, (0, T), w0, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(w_sim, sol.y[:, -1], atol=0.02)


def test_cartpole_like_model_steps():
    """2-dof cart+pole: effort on cart accelerates it; pole reacts."""
    mb = ModelBuilder()
    base = mb.add_body("slider", -1, JT_FIXED)
    cart = mb.add_body(
        "cart", base, JT_PRISMATIC, joint_axis=(0, 1, 0), mass=1.0,
        inertia=box_inertia(1.0, 0.2, 0.25, 0.2),
        lower=-4.0, upper=4.0, effort=1000.0, has_limit=True,
        drive_mode=3,  # EFFORT
    )
    mb.add_body(
        "pole", cart, JT_REVOLUTE, joint_pos=(0.12, 0, 0), joint_axis=(1, 0, 0),
        mass=1.0, com=(0, 0, 0.47), inertia=box_inertia(1.0, 0.04, 0.06, 1.0),
        effort=1000.0, drive_mode=0,
    )
    model = mb.finalize()
    state = make_zero_state(model, 3)
    ctrl = engine.Control.zero(model, 3)
    ctrl = ctrl.replace(effort=jnp.array([[10.0, 0.0], [0.0, 0.0], [-10.0, 0.0]]))

    s = engine.step(model, None, state, ctrl, 1.0 / 60.0, substeps=2)
    cart_v = np.asarray(s.qd[:, 0])
    assert cart_v[0] > 0.01 and abs(cart_v[1]) < 1e-5 and cart_v[2] < -0.01
    # pushing the cart makes the (upright, unstable) pole rotate opposite
    assert abs(float(s.qd[0, 1])) > 1e-4


def test_aba_matches_crba_solve():
    """ABA must agree with the CRBA+solve route on a branched floating tree."""
    from isaacgymenv_tpu.physics.builder import ModelBuilder
    from isaacgymenv_tpu.physics import dynamics, kinematics

    mb = ModelBuilder()
    root = mb.add_body("root", -1, JT_FREE, mass=2.0, inertia=np.diag([0.1, 0.12, 0.09]), com=(0.02, 0, 0.01))
    l1 = mb.add_body("l1", root, JT_REVOLUTE, joint_pos=(0.1, 0.2, 0), joint_axis=(0, 1, 0),
                     mass=0.7, com=(0, 0, -0.2), inertia=np.diag([0.01, 0.01, 0.002]), armature=0.01)
    mb.add_body("l2", l1, JT_PRISMATIC, joint_pos=(0, 0, -0.4), joint_axis=(1, 0, 0),
                mass=0.3, com=(0.05, 0, 0), inertia=np.diag([0.002, 0.003, 0.002]), armature=0.02)
    mb.add_body("l3", root, JT_REVOLUTE, joint_pos=(-0.1, 0, 0.1), joint_quat=(0.3, 0.1, 0, 0.95),
                joint_axis=(1, 0, 0), mass=0.5, com=(0, 0.1, 0), inertia=np.diag([0.004, 0.002, 0.004]))
    model = mb.finalize()

    rng = np.random.default_rng(3)
    N = 16
    q = np.zeros((N, model.nq), np.float32)
    q[:, 0:3] = rng.normal(size=(N, 3))
    quat = rng.normal(size=(N, 4)); quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    q[:, 3:7] = quat
    q[:, 7:] = rng.uniform(-1, 1, size=(N, model.nd))
    qd = jnp.array(rng.normal(size=(N, model.nv)) * 0.5, jnp.float32)
    q = jnp.array(q)
    tau = jnp.array(rng.normal(size=(N, model.nv)), jnp.float32)
    f_ext = jnp.array(rng.normal(size=(N, model.nb, 6)), jnp.float32)

    kin = kinematics.fk(model, q, qd)
    qdd_crba = dynamics.forward_dynamics(model, kin, tau, f_ext)
    qdd_aba = dynamics.aba(model, kin, tau, f_ext)
    np.testing.assert_allclose(np.asarray(qdd_aba), np.asarray(qdd_crba), rtol=2e-3, atol=2e-3)


def test_aba_lp_matches_aba():
    """Level-parallel ABA must agree with serial ABA on a branched floating
    tree with fixed joints, armature, external wrenches, and d_extra."""
    from isaacgymenv_tpu.physics.builder import ModelBuilder
    from isaacgymenv_tpu.physics import dynamics, kinematics

    mb = ModelBuilder()
    root = mb.add_body("root", -1, JT_FREE, mass=2.0,
                       inertia=np.diag([0.1, 0.12, 0.09]), com=(0.02, 0, 0.01))
    l1 = mb.add_body("l1", root, JT_REVOLUTE, joint_pos=(0.1, 0.2, 0),
                     joint_axis=(0, 1, 0), mass=0.7, com=(0, 0, -0.2),
                     inertia=np.diag([0.01, 0.01, 0.002]), armature=0.01)
    l2 = mb.add_body("l2", l1, JT_PRISMATIC, joint_pos=(0, 0, -0.4),
                     joint_axis=(1, 0, 0), mass=0.3, com=(0.05, 0, 0),
                     inertia=np.diag([0.002, 0.003, 0.002]), armature=0.02)
    mb.add_body("fx", l2, JT_FIXED, joint_pos=(0.1, 0, 0), mass=0.2,
                com=(0, 0, 0.05), inertia=np.diag([0.001, 0.001, 0.001]))
    l3 = mb.add_body("l3", root, JT_REVOLUTE, joint_pos=(-0.1, 0, 0.1),
                     joint_quat=(0.3, 0.1, 0, 0.95), joint_axis=(1, 0, 0),
                     mass=0.5, com=(0, 0.1, 0),
                     inertia=np.diag([0.004, 0.002, 0.004]))
    mb.add_body("l4", l3, JT_REVOLUTE, joint_pos=(0, 0.2, 0),
                joint_axis=(0, 0, 1), mass=0.25, com=(0, 0.05, 0),
                inertia=np.diag([0.001, 0.001, 0.0005]), armature=0.005)
    model = mb.finalize()

    rng = np.random.default_rng(7)
    N = 8
    q = np.zeros((N, model.nq), np.float32)
    q[:, :3] = rng.normal(size=(N, 3))
    quat = rng.normal(size=(N, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    q[:, 3:7] = quat
    q[:, 7:] = rng.uniform(-1, 1, size=(N, model.nd))
    qd = jnp.array(rng.normal(size=(N, model.nv)) * 0.5, jnp.float32)
    tau = jnp.array(rng.normal(size=(N, model.nv)), jnp.float32)
    f_ext = jnp.array(rng.normal(size=(N, model.nb, 6)), jnp.float32)
    d_extra = jnp.array(rng.uniform(0, 0.1, size=(N, model.nd)), jnp.float32)

    kin = kinematics.fk(model, jnp.array(q), qd)
    a1 = dynamics.aba(model, kin, tau, f_ext, d_extra=d_extra)
    a2 = dynamics.aba_lp(model, kin, tau, f_ext, d_extra=d_extra)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-4, atol=1e-4)


def test_fk_lp_matches_fk():
    """Level-parallel FK must agree with serial FK (all Kin fields)."""
    from isaacgymenv_tpu.physics.builder import ModelBuilder
    from isaacgymenv_tpu.physics import kinematics

    mb = ModelBuilder()
    root = mb.add_body("root", -1, JT_FREE, mass=2.0,
                       inertia=np.diag([0.1, 0.12, 0.09]), com=(0.02, 0, 0.01))
    l1 = mb.add_body("l1", root, JT_REVOLUTE, joint_pos=(0.1, 0.2, 0),
                     joint_axis=(0, 1, 0), mass=0.7, com=(0, 0, -0.2),
                     inertia=np.diag([0.01, 0.01, 0.002]))
    l2 = mb.add_body("l2", l1, JT_PRISMATIC, joint_pos=(0, 0, -0.4),
                     joint_axis=(1, 0, 0), mass=0.3, com=(0.05, 0, 0),
                     inertia=np.diag([0.002, 0.003, 0.002]))
    mb.add_body("fx", l2, JT_FIXED, joint_pos=(0.1, 0, 0), mass=0.2,
                com=(0, 0, 0.05), inertia=np.diag([0.001, 0.001, 0.001]))
    l3 = mb.add_body("l3", root, JT_REVOLUTE, joint_pos=(-0.1, 0, 0.1),
                     joint_quat=(0.3, 0.1, 0, 0.95), joint_axis=(1, 0, 0),
                     mass=0.5, com=(0, 0.1, 0),
                     inertia=np.diag([0.004, 0.002, 0.004]))
    model = mb.finalize()

    rng = np.random.default_rng(11)
    N = 8
    q = np.zeros((N, model.nq), np.float32)
    q[:, :3] = rng.normal(size=(N, 3))
    quat = rng.normal(size=(N, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    q[:, 3:7] = quat
    q[:, 7:] = rng.uniform(-1, 1, size=(N, model.nd))
    qd = jnp.array(rng.normal(size=(N, model.nv)) * 0.5, jnp.float32)

    k1 = kinematics.fk(model, jnp.array(q), qd)
    k2 = kinematics.fk_lp(model, jnp.array(q), qd)
    for name in ("R_l", "p_l", "R_w", "p_w", "v"):
        for i in range(model.nb):
            np.testing.assert_allclose(
                np.asarray(getattr(k2, name)[i]),
                np.asarray(getattr(k1, name)[i]),
                rtol=1e-5, atol=1e-5,
            )


def test_screw_joint_fk_and_dynamics():
    """JT_SCREW: helical coupling z = lead*q, v = S*qd with S=[axis,lead*axis];
    ABA == aba_lp == CRBA+solve == analytic 1-DOF solution."""
    from isaacgymenv_tpu.physics.builder import ModelBuilder
    from isaacgymenv_tpu.physics import dynamics, kinematics
    from isaacgymenv_tpu.physics.types import JT_SCREW

    PITCH = 0.002
    mb = ModelBuilder()
    bolt = mb.add_body("bolt", -1, JT_FIXED, joint_pos=(0, 0, 0.4),
                       mass=0.1, inertia=np.diag([1e-4] * 3))
    nut = mb.add_body("nut", bolt, JT_SCREW, joint_pos=(0, 0, 0.025),
                      joint_axis=(0, 0, 1), mass=0.03,
                      inertia=np.diag([2e-6, 2e-6, 4e-6]), pitch=PITCH)
    model = mb.finalize()
    lead = PITCH / (2 * np.pi)

    q = jnp.array([[0.5]])
    qd = jnp.array([[2.0]])
    kin = kinematics.fk(model, q, qd)
    kin2 = kinematics.fk_lp(model, q, qd)
    np.testing.assert_allclose(
        np.asarray(kin.p_w[nut][0, 2]), 0.4 + 0.025 + lead * 0.5, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(kin.v[nut][0]), [0, 0, 2, 0, 0, 2 * lead], atol=1e-7
    )
    for nm in ("R_l", "p_l", "R_w", "p_w", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(kin2, nm)[nut]),
            np.asarray(getattr(kin, nm)[nut]), rtol=1e-5, atol=1e-6,
        )

    tau = jnp.array([[1e-3]])
    expect = (1e-3 - 0.03 * 9.81 * lead) / (4e-6 + 0.03 * lead**2)
    for qdd in (
        dynamics.aba(model, kin, tau),
        dynamics.aba_lp(model, kin, tau),
        dynamics.forward_dynamics(model, kin, tau),
    ):
        np.testing.assert_allclose(float(qdd[0, 0]), expect, rtol=1e-4)


def test_joint_wrench_static_weight():
    """A static hanging link's inbound-joint wrench must equal its weight
    (the force-sensor reading; ref: acquire_force_sensor_tensor)."""
    from isaacgymenv_tpu.physics.builder import ModelBuilder
    from isaacgymenv_tpu.physics import dynamics, kinematics

    mb = ModelBuilder()
    base = mb.add_body("base", -1, JT_FIXED, joint_pos=(0, 0, 1.0),
                       mass=1.0, inertia=np.diag([0.01] * 3))
    arm = mb.add_body("arm", base, JT_REVOLUTE, joint_pos=(0, 0, 0),
                      joint_axis=(0, 1, 0), mass=2.0, com=(0, 0, -0.5),
                      inertia=np.diag([0.1, 0.1, 0.01]))
    model = mb.finalize()

    q = jnp.zeros((4, model.nq))
    qd = jnp.zeros((4, model.nv))
    tau = jnp.zeros((4, model.nv))
    kin = kinematics.fk(model, q, qd)
    qdd, fj = dynamics.aba_lp(model, kin, tau, return_joint_forces=True)
    np.testing.assert_allclose(np.asarray(qdd), 0.0, atol=1e-5)
    # fj rows are [n(3), f(3)] body frame: pure vertical support force m*g
    np.testing.assert_allclose(
        np.asarray(fj[:, arm]), np.tile([0, 0, 0, 0, 0, 2.0 * 9.81], (4, 1)),
        atol=1e-4,
    )
