"""Quaternion / rotation / transform math for the TPU-native env engine.

Pure-JAX counterparts of the reference's torch math library
(`isaacgymenvs/utils/torch_jit_utils.py` in dohyeon-Lee/IsaacgymEnv).  Every
function here is a pure function over `jnp` arrays, safe under `jit` / `vmap`
/ `grad`, and uses the Isaac Gym quaternion layout: **(x, y, z, w)**.

All functions accept arbitrary leading batch dimensions: quaternions are
`(..., 4)`, vectors `(..., 3)`.

Parity notes (reference file:line cited per function) are behavioral specs,
not copied code: the formulas are standard rigid-body math.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def f32_matmul(fn):
    """Force float32 matmul/einsum precision while tracing `fn`.

    On TPU, XLA's DEFAULT matmul precision feeds fp32 operands to the MXU
    as bfloat16 (~8 mantissa bits).  For neural nets that's the right
    trade, but the physics FK/contact einsums operate on WORLD coordinates:
    at |p| ~ 130 m (terrain-grid env origins) bf16 quantizes positions to
    ~0.5 m, freezing integrated motion whenever a derived pose is written
    back into the state (measured: AnymalTerrain roots reported 0.76 m/s
    while displacing 0.13 m/s — the r4 terrain-curriculum stall).  Every
    physics entry point wraps itself in this scope; the learning stack
    stays on the fast default.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


# ---------------------------------------------------------------------------
# basics
# ---------------------------------------------------------------------------


def normalize(x: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Unit-normalize along the last axis (ref: torch_jit_utils.py:142)."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def copysign(a: float, b: jnp.ndarray) -> jnp.ndarray:
    """|a| with the sign of b (ref: torch_jit_utils.py:156)."""
    return jnp.copysign(jnp.asarray(a, dtype=b.dtype), b)


def normalize_angle(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle to [-pi, pi] (ref: torch_jit_utils.py:244)."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def tensor_clamp(t: jnp.ndarray, min_t: jnp.ndarray, max_t: jnp.ndarray) -> jnp.ndarray:
    """Elementwise clamp with tensor bounds (ref: torch_jit_utils.py:229)."""
    return jnp.clip(t, min_t, max_t)


def scale(x: jnp.ndarray, lower: jnp.ndarray, upper: jnp.ndarray) -> jnp.ndarray:
    """Map [-1, 1] -> [lower, upper] (ref: torch_jit_utils.py:234)."""
    return 0.5 * (x + 1.0) * (upper - lower) + lower


def unscale(x: jnp.ndarray, lower: jnp.ndarray, upper: jnp.ndarray) -> jnp.ndarray:
    """Map [lower, upper] -> [-1, 1] (ref: torch_jit_utils.py:239)."""
    return (2.0 * x - upper - lower) / (upper - lower)


def saturate(x: jnp.ndarray, lower: jnp.ndarray, upper: jnp.ndarray) -> jnp.ndarray:
    """unscale + clamp to [-1, 1] (ref: torch_jit_utils.py:300)."""
    return jnp.clip(unscale(x, lower, upper), -1.0, 1.0)


# ---------------------------------------------------------------------------
# quaternions — layout (x, y, z, w)
# ---------------------------------------------------------------------------

QUAT_IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b in xyzw layout (ref: torch_jit_utils.py:42)."""
    x1, y1, z1, w1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x2, y2, z2, w2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (inverse for unit quats) (ref: torch_jit_utils.py:74)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_unit(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion (ref: torch_jit_utils.py:146)."""
    return normalize(q)


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (ref: torch_jit_utils.py:81 quat_apply).

    Uses the 2-cross-product form: v' = v + 2*w*(u x v) + 2*u x (u x v).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


# quat_rotate is the same operation in the reference (torch_jit_utils.py:81/94)
quat_rotate = quat_apply


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by q^{-1} (ref: torch_jit_utils.py:94)."""
    return quat_apply(quat_conjugate(q), v)


def quat_from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from angle (rad) about unit axis (ref: torch_jit_utils.py:150)."""
    theta = (angle / 2.0)[..., None]
    xyz = normalize(axis) * jnp.sin(theta)
    w = jnp.cos(theta)
    return quat_unit(jnp.concatenate([xyz, w], axis=-1))


def quat_axis(q: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Basis vector `axis` of the rotation (ref: torch_jit_utils.py:357)."""
    basis = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., axis].set(1.0)
    return quat_apply(q, basis)


def quat_from_euler_xyz(roll: jnp.ndarray, pitch: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic xyz Euler -> quat (ref: torch_jit_utils.py:199)."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def get_euler_xyz(q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quat -> (roll, pitch, yaw) (ref: torch_jit_utils.py:168)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(jnp.abs(sinp) >= 1.0, copysign(math.pi / 2.0, sinp), jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)))

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    two_pi = 2.0 * math.pi
    return roll % two_pi, pitch % two_pi, yaw % two_pi


def quat_diff_rad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle between two quats (ref: torch_jit_utils.py:354)."""
    mul = quat_mul(a, quat_conjugate(b))
    return 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(mul[..., :3], axis=-1), -1.0, 1.0))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> 3x3 rotation matrix, xyzw layout. (..., 4) -> (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> quaternion (xyzw), branch-free Shepperd variant."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0), qw0], -1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)], -1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)], -1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)], -1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None], c0,
        jnp.where(cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3)),
    )
    return quat_unit(q)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Integrate unit quat by world-frame angular velocity over dt (exp map)."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    half = 0.5 * angle * dt
    # sinc-safe axis*sin(half)
    k = jnp.where(angle > 1e-9, jnp.sin(half) / jnp.maximum(angle, 1e-9), 0.5 * dt)
    dq = jnp.concatenate([omega_world * k, jnp.cos(half)], axis=-1)
    return quat_unit(quat_mul(dq, q))


# ---------------------------------------------------------------------------
# heading / up utilities (Ant/Humanoid family)
# ---------------------------------------------------------------------------


def compute_heading_and_up(torso_rotation, inv_start_rot, to_target, vec0, vec1, up_idx):
    """ref: torch_jit_utils.py:248 — heading/up projections for Ant/Humanoid."""
    target_dirs = normalize(to_target)
    torso_quat = quat_mul(torso_rotation, inv_start_rot)
    up_vec = quat_rotate(torso_quat, vec1)
    heading_vec = quat_rotate(torso_quat, vec0)
    up_proj = up_vec[..., up_idx]
    heading_proj = jnp.sum(heading_vec * target_dirs, axis=-1)
    return torso_quat, up_proj, heading_proj, up_vec, heading_vec


def compute_rot(torso_quat, velocity, ang_velocity, targets, torso_positions):
    """ref: torch_jit_utils.py:266 — body-frame vels + roll/pitch/yaw + angle-to-target."""
    vel_loc = quat_rotate_inverse(torso_quat, velocity)
    angvel_loc = quat_rotate_inverse(torso_quat, ang_velocity)
    roll, pitch, yaw = get_euler_xyz(torso_quat)
    walk_target_angle = jnp.arctan2(
        targets[..., 2] - torso_positions[..., 2], targets[..., 0] - torso_positions[..., 0]
    )
    angle_to_target = walk_target_angle - yaw
    return vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target


def calc_heading(q: jnp.ndarray) -> jnp.ndarray:
    """Heading angle about z from quat (ref: torch_jit_utils.py:630)."""
    ref_dir = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def calc_heading_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quat of just the heading rotation (ref: torch_jit_utils.py:644)."""
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., 2].set(1.0)
    return quat_from_angle_axis(heading, axis)


def calc_heading_quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse heading quat (ref: torch_jit_utils.py:657)."""
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., 2].set(1.0)
    return quat_from_angle_axis(-heading, axis)


# ---------------------------------------------------------------------------
# exp-map / tan-norm parameterizations (AMP / humanoid)
# ---------------------------------------------------------------------------


def quat_to_angle_axis(q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ref: torch_jit_utils.py:446 — quat -> (angle, axis)."""
    min_theta = 1e-5
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - qw * qw, 0.0))
    angle = 2.0 * jnp.arccos(jnp.clip(qw, -1.0, 1.0))
    angle = normalize_angle(angle)
    sin_theta_expand = sin_theta[..., None]
    axis = jnp.stack([qx, qy, qz], axis=-1) / jnp.maximum(sin_theta_expand, min_theta)
    mask = sin_theta > min_theta
    default_axis = jnp.zeros_like(axis).at[..., -1].set(1.0)
    angle = jnp.where(mask, angle, 0.0)
    axis = jnp.where(mask[..., None], axis, default_axis)
    return angle, axis


def angle_axis_to_exp_map(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """ref: torch_jit_utils.py:469."""
    return angle[..., None] * axis


def quat_to_exp_map(q: jnp.ndarray) -> jnp.ndarray:
    """ref: torch_jit_utils.py:477."""
    angle, axis = quat_to_angle_axis(q)
    return angle_axis_to_exp_map(angle, axis)


def exp_map_to_angle_axis(exp_map: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ref: torch_jit_utils.py:541."""
    min_theta = 1e-5
    angle = jnp.linalg.norm(exp_map, axis=-1)
    angle_exp = jnp.maximum(angle[..., None], min_theta)
    axis = exp_map / angle_exp
    angle = normalize_angle(angle)
    mask = angle > min_theta
    default_axis = jnp.zeros_like(axis).at[..., -1].set(1.0)
    angle = jnp.where(mask, angle, 0.0)
    axis = jnp.where(mask[..., None], axis, default_axis)
    return angle, axis


def exp_map_to_quat(exp_map: jnp.ndarray) -> jnp.ndarray:
    """ref: torch_jit_utils.py:559."""
    angle, axis = exp_map_to_angle_axis(exp_map)
    return quat_from_angle_axis(angle, axis)


def quat_to_tan_norm(q: jnp.ndarray) -> jnp.ndarray:
    """ref: torch_jit_utils.py:430 — 6D rotation representation (tangent+normal)."""
    ref_tan = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., 0].set(1.0)
    tan = quat_rotate(q, ref_tan)
    ref_norm = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., -1].set(1.0)
    norm = quat_rotate(q, ref_norm)
    return jnp.concatenate([tan, norm], axis=-1)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation (ref: torch_jit_utils.py:595)."""
    cos_half_theta = jnp.sum(q0 * q1, axis=-1)
    neg_mask = cos_half_theta < 0.0
    q1 = jnp.where(neg_mask[..., None], -q1, q1)
    cos_half_theta = jnp.abs(cos_half_theta)[..., None]
    half_theta = jnp.arccos(jnp.clip(cos_half_theta, -1.0, 1.0))
    sin_half_theta = jnp.sqrt(jnp.maximum(1.0 - cos_half_theta * cos_half_theta, 0.0))

    ratio_a = jnp.sin((1.0 - t) * half_theta) / jnp.maximum(sin_half_theta, 1e-9)
    ratio_b = jnp.sin(t * half_theta) / jnp.maximum(sin_half_theta, 1e-9)
    new_q = ratio_a * q0 + ratio_b * q1
    new_q = jnp.where(jnp.abs(cos_half_theta) >= 1.0, q0, new_q)
    new_q = jnp.where(sin_half_theta < 0.001, 0.5 * q0 + 0.5 * q1, new_q)
    return new_q


# ---------------------------------------------------------------------------
# random sampling (reference: torch_rand_float, torch_random_dir_2)
# ---------------------------------------------------------------------------


def rand_float(key: jax.Array, lower, upper, shape) -> jnp.ndarray:
    """Uniform in [lower, upper) (ref: torch_jit_utils.py:216 torch_rand_float)."""
    return jax.random.uniform(key, shape, minval=lower, maxval=upper, dtype=jnp.float32)


def random_dir_2(key: jax.Array, shape) -> jnp.ndarray:
    """Random 2D unit direction embedded in 3D (ref: torch_jit_utils.py:222)."""
    angle = jax.random.uniform(key, shape, minval=-math.pi, maxval=math.pi)
    return jnp.stack([jnp.cos(angle), jnp.sin(angle), jnp.zeros_like(angle)], axis=-1)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q (ref: anymal_terrain.py:679)."""
    quat_yaw = jnp.concatenate([jnp.zeros_like(q[..., :2]), q[..., 2:4]], axis=-1)
    return quat_apply(quat_unit(quat_yaw), v)


def wrap_to_pi(angles: jnp.ndarray) -> jnp.ndarray:
    """ref: anymal_terrain.py:686 — wrap to (-pi, pi]."""
    a = angles % (2.0 * math.pi)
    return a - 2.0 * math.pi * (a > math.pi)
