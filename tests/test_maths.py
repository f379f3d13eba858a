"""Math-core tests: validate quaternion/transform ops against scipy Rotation.

scipy uses the same (x, y, z, w) quaternion layout as Isaac Gym, giving an
independent oracle for the reference-parity math library.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from isaacgymenv_tpu.ops import maths


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quat_mul_matches_scipy():
    a, b = random_quats(64, 1), random_quats(64, 2)
    got = np.asarray(maths.quat_mul(jnp.array(a), jnp.array(b)))
    want = (R.from_quat(a) * R.from_quat(b)).as_quat()
    # quats are double covers: compare up to sign
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-5)


def test_quat_rotate_matches_scipy():
    q = random_quats(64, 3)
    v = np.random.default_rng(4).normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(maths.quat_rotate(jnp.array(q), jnp.array(v)))
    want = R.from_quat(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quat_rotate_inverse_roundtrip():
    q = jnp.array(random_quats(32, 5))
    v = jnp.array(np.random.default_rng(6).normal(size=(32, 3)).astype(np.float32))
    vr = maths.quat_rotate(q, v)
    back = maths.quat_rotate_inverse(q, vr)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-4)


def test_quat_to_rotmat_matches_scipy():
    q = random_quats(64, 7)
    got = np.asarray(maths.quat_to_rotmat(jnp.array(q)))
    want = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotmat_to_quat_roundtrip():
    q = random_quats(64, 8)
    m = maths.quat_to_rotmat(jnp.array(q))
    q2 = np.asarray(maths.rotmat_to_quat(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_quat_from_euler_xyz_matches_scipy():
    rng = np.random.default_rng(9)
    rpy = rng.uniform(-np.pi, np.pi, size=(64, 3)).astype(np.float32)
    got = np.asarray(
        maths.quat_from_euler_xyz(jnp.array(rpy[:, 0]), jnp.array(rpy[:, 1]), jnp.array(rpy[:, 2]))
    )
    want = R.from_euler("xyz", rpy).as_quat()
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-5)


def test_get_euler_xyz_roundtrip():
    rng = np.random.default_rng(10)
    rpy = rng.uniform(-1.0, 1.0, size=(32, 3)).astype(np.float32)  # avoid gimbal zone
    q = maths.quat_from_euler_xyz(jnp.array(rpy[:, 0]), jnp.array(rpy[:, 1]), jnp.array(rpy[:, 2]))
    r, p, y = maths.get_euler_xyz(q)
    # reference returns angles mod 2pi; normalize back to [-pi, pi]
    out = np.stack([np.asarray(maths.normalize_angle(a)) for a in (r, p, y)], axis=-1)
    np.testing.assert_allclose(out, rpy, atol=1e-4)


def test_quat_from_angle_axis():
    angle = jnp.array([0.3, -1.2], dtype=jnp.float32)
    axis = jnp.array([[0, 0, 1], [1, 0, 0]], dtype=jnp.float32)
    got = np.asarray(maths.quat_from_angle_axis(angle, axis))
    want = R.from_rotvec(np.asarray(angle)[:, None] * np.asarray(axis)).as_quat()
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-5)


def test_quat_integrate_constant_omega():
    # integrating constant world omega over many small steps ~ exact rotation
    omega = jnp.array([[0.0, 0.0, 1.5]], dtype=jnp.float32)
    dt, steps = 0.001, 1000

    @jax.jit
    def run(q):
        return jax.lax.fori_loop(0, steps, lambda i, q: maths.quat_integrate(q, omega, dt), q)

    q = run(jnp.tile(maths.QUAT_IDENTITY, (1, 1)))
    want = R.from_rotvec([[0, 0, 1.5]]).as_quat()
    got = np.asarray(q)
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-3)


def test_exp_map_roundtrip():
    q = jnp.array(random_quats(32, 11))
    em = maths.quat_to_exp_map(q)
    q2 = maths.exp_map_to_quat(em)
    ang = np.asarray(maths.quat_diff_rad(q, q2))
    np.testing.assert_allclose(ang, 0.0, atol=1e-3)


def test_slerp_endpoints_and_midpoint():
    q0 = jnp.array(random_quats(16, 12))
    q1 = jnp.array(random_quats(16, 13))
    t0 = maths.slerp(q0, q1, jnp.zeros((16, 1)))
    t1 = maths.slerp(q0, q1, jnp.ones((16, 1)))
    np.testing.assert_allclose(np.asarray(maths.quat_diff_rad(t0, q0)), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(maths.quat_diff_rad(t1, q1)), 0.0, atol=1e-3)


def test_scale_unscale():
    lo, hi = jnp.array([-2.0]), jnp.array([4.0])
    x = jnp.linspace(-1, 1, 11)[:, None]
    s = maths.scale(x, lo, hi)
    np.testing.assert_allclose(np.asarray(maths.unscale(s, lo, hi)), np.asarray(x), atol=1e-6)
    assert float(s.min()) == -2.0 and float(s.max()) == 4.0


def test_normalize_angle():
    x = jnp.array([3 * np.pi, -3 * np.pi, 0.5, 7.0])
    got = np.asarray(maths.normalize_angle(x))
    want = np.array([np.pi, -np.pi, 0.5, 7.0 - 2 * np.pi])
    # compare as angles (pi and -pi are the same angle)
    diff = np.abs(np.angle(np.exp(1j * (got - want))))
    np.testing.assert_allclose(diff, 0.0, atol=1e-5)
    assert np.all(np.abs(got) <= np.pi + 1e-5)


def test_calc_heading():
    q = maths.quat_from_euler_xyz(jnp.array(0.0), jnp.array(0.0), jnp.array(1.1))
    np.testing.assert_allclose(float(maths.calc_heading(q)), 1.1, atol=1e-5)


def test_jit_vmap_compat():
    # everything must trace under jit+vmap
    q = jnp.array(random_quats(8, 14))
    v = jnp.ones((8, 3))
    f = jax.jit(jax.vmap(maths.quat_rotate))
    np.testing.assert_allclose(np.asarray(f(q, v)), np.asarray(maths.quat_rotate(q, v)), atol=1e-6)
