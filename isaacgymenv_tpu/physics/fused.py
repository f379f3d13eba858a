"""Fused Pallas substep: the whole physics substep loop in ONE TPU kernel.

The XLA engine path (`engine.step`) emits hundreds of small HBM-bound
kernels per substep — every FK/ABA intermediate round-trips through HBM.
This module lowers the complete substep pipeline (FK -> plane contacts ->
actuation/passive forces -> ABA -> semi-implicit integration), including
the inner `substeps` loop, into a single `pallas_call`: per grid cell a
block of envs is loaded into VMEM once and every intermediate lives
on-chip.

Layout: structure-of-arrays with envs on the VPU lanes.  Every physical
scalar (a quaternion component, one entry of a 6x6 articulated inertia) is
a `(S, 128)` tile over S*128 envs; all spatial algebra unrolls at trace
time into elementwise VPU ops.  There are no matmuls — a 3x3 rotation
apply is 9 fused multiply-adds per env — so the kernel is pure VPU work
with ~KBs of HBM traffic per step (q/qd/targets in, q/qd/forces out).

Replicates `engine._substep` for the fast-path model class: floating/fixed
base + revolute/prismatic joints, sphere-vs-ground contacts (flat plane or
heightfield input mode), body-vs-body pair contacts against static
sphere/box/capsule/cylinder surfaces, world anchors, fixed tendons,
per-body gravity compensation, external body wrenches, per-env friction,
AND the DR-batched model leaves (per-env masses, dof gains/limits,
gravity) as runtime inputs — domain randomization stays on the fast path.
`fused_ok` gates dispatch; screw joints and other traced model leaves fall
back to the XLA path.  Numerical equivalence vs engine.step is tested in
tests/test_fused.py.

ref: SURVEY.md §7 "hard parts" #7 (throughput; "this is the Pallas work").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    DRIVE_NONE,
    DRIVE_POS,
    DRIVE_VEL,
    JT_FIXED,
    JT_FREE,
    JT_PRISMATIC,
    JT_REVOLUTE,
    SimModel,
)

# passive-force constants imported from the XLA engine so the two paths can
# never drift apart
from isaacgymenv_tpu.physics.engine import (  # noqa: E402
    _FRICTION_VEL_EPS,
    _LIMIT_DAMPING,
    _LIMIT_STIFFNESS,
    _MAX_ROOT_ANGVEL,
    _MAX_ROOT_LINVEL,
)

LANES = 128


# ---------------------------------------------------------------------------
# eligibility
# ---------------------------------------------------------------------------


def fused_ok(model: SimModel, terrain, body_wrench, num_envs: int) -> bool:
    """True when the MONOLITHIC fused kernel fits this scene (structure +
    VMEM).  Scenes that pass the structural check but not the VMEM check
    can still run the split two-kernel path (physics/fused_split.py)."""
    if not fused_structural_ok(model, terrain, body_wrench, num_envs):
        return False
    # no Mosaic-valid sublane block within the VMEM budget -> XLA path
    return _block_s(num_envs, model) is not None


def fused_structural_ok(
    model: SimModel, terrain, body_wrench, num_envs: int
) -> bool:
    """True when the fused kernels (monolithic OR split) reproduce
    engine._substep for this scene, VMEM aside.

    Heightfield terrain, per-body external wrenches, per-env friction, AND
    the DR-batched model leaves (body_mass/geom_meff, dof stiffness/damping/
    limits, gravity) are supported as kernel INPUTS (see build_fused_substep
    modes) — the fast path survives domain randomization.  Screw joints and
    any other batched/traced model leaves fall back to the XLA path.
    """
    if any(jt not in (JT_FREE, JT_REVOLUTE, JT_PRISMATIC, JT_FIXED) for jt in model.jtype):
        return False
    # SDF mesh colliders (grid gathers) run on the XLA path
    if model.n_sdf:
        return False
    # containment walls (SURF_WALL, kind 4) are XLA-path only
    if any(k == 4 for k in model.surf_kind):
        return False
    # free joints are only fused at actor roots (the ABA backward pass
    # terminates articulated propagation there); mid-chain free joints fall
    # back to the XLA path
    if any(jt == JT_FREE and int(par) >= 0
           for jt, par in zip(model.jtype, model.parent)):
        return False
    # dof-width kernel I/O (targets, dof_force) is zero-width when the scene
    # has no actuated dofs — pallas rejects 0-dim blocks; XLA path instead
    if model.nd == 0:
        return False
    # pair-contact / anchor / tendon params must be static to bake
    for leaf in (model.surf_size, model.surf_friction, model.surf_meff,
                 model.anchor_target, model.anchor_meff, model.tendon_coef,
                 model.tendon_range, model.body_gravcomp):
        if leaf is not None and isinstance(leaf, jax.core.Tracer):
            return False
    # per-env object-dimension / actor-scale DR batches the geometry
    # leaves — XLA path
    if model.n_pairs and jnp.ndim(model.surf_size) != 2:
        return False
    if model.n_pairs and jnp.ndim(model.surf_offset) != 2:
        return False
    if jnp.ndim(model.geom_offset) != 2 or jnp.ndim(model.geom_radius) != 1:
        return False
    if jnp.ndim(model.joint_pos) != 2:
        return False
    if model.n_pairs and (
        jnp.ndim(model.surf_meff) != 1 or jnp.ndim(model.surf_friction) != 1
    ):
        return False
    if jnp.ndim(model.body_inertia) != 3:
        return False
    # DR-batched leaves ride as runtime inputs; ndim is static metadata,
    # safe on tracers (DR-batched leaves under jit)
    if jnp.ndim(model.body_mass) not in (1, 2):
        return False
    if model.nd:
        for leaf in (model.dof_stiffness, model.dof_damping,
                     model.dof_lower, model.dof_upper):
            if jnp.ndim(leaf) not in (1, 2):
                return False
    if jnp.ndim(model.geom_friction) not in (1, 2):  # 2 = per-env input mode
        return False
    if jnp.ndim(model.gravity) not in (1, 2):
        return False
    if jnp.ndim(model.geom_meff) not in (1, 2):
        return False
    # 1-D tracer leaves cannot be baked as constants AND are not inputs
    # (batched 2-D versions of these ARE inputs; see the mode flags)
    for leaf in (model.body_mass, model.geom_meff, model.dof_stiffness,
                 model.dof_damping, model.dof_lower, model.dof_upper,
                 model.gravity, model.geom_friction):
        if jnp.ndim(leaf) == 1 and isinstance(leaf, jax.core.Tracer):
            return False
    if isinstance(model.contact_stiffness, jax.core.Tracer):
        return False
    # mass input mode scales spatial inertias linearly in mass — needs a
    # static base mass to factor against
    if jnp.ndim(model.body_mass) == 2 and isinstance(
        model.body_inertia, jax.core.Tracer
    ):
        return False
    if num_envs % LANES != 0:
        return False
    return True


def _pair_modes(num_envs: int, model: SimModel):
    """(sublanes per grid cell, slim_pairs) or None when nothing fits VMEM.

    Mosaic requires the block's sublane dim to be divisible by 8 OR equal
    to the full array dim (num_envs // 128) — so the only valid choices are
    S=8 (full fp32 tile) and, for small scenes, the whole array (grid=1).

    Empirical calibration (TPU v5e, 2026-08, measured across 4 scenes):
    Mosaic's ACTUAL scoped-vmem stack demand runs ~2.2x this register
    estimate in cache mode (pipeline double buffering + spill headroom;
    raising xla_tpu_scoped_vmem_limit_kib does NOT rescue an over-budget
    scene — demand grows with the limit).  Against the 16MB hardware
    stack, estimates above ~7MB fail to lower, so the default budget is
    7MB: Anymal (6.9M est) compiles, UsefulHound (8.0M, no pairs!) and
    ShadowHand (13.9M, 256 pairs) correctly fall back to the XLA path.

    The slim pair schedule (ISAACGYMENV_TPU_FUSED_SLIM=1: pass 1 keeps
    only the active bit, pass 2 re-derives the surface query) is
    experiment-only — Mosaic CSEs the recompute back into a cache and its
    measured demand is WORSE than cache mode (ShadowHand: 31.3M vs 27.4M),
    so it is never auto-selected."""
    import os

    # live (S,128)-valued registers: FK/ABA state + contact caches +
    # carried stiction state (q/qd/slip in/out blocks are aliased).
    # no_ground scenes skip the ground pass and its slip state: only the
    # 3/geom world offsets (pair inputs) stay live.
    ng_regs = 3 * model.ng if model.no_ground else 7 * model.ng
    base = (
        20 * model.nb + ng_regs
        + 2 * (model.nq + model.nv + 2 * model.nd) + 300
    )
    budget = int(os.environ.get(
        "ISAACGYMENV_TPU_FUSED_VMEM_BUDGET", 7 * 1024 * 1024
    ))
    full = num_envs // LANES
    candidates = []
    if num_envs % (8 * LANES) == 0:
        candidates.append(8)
    if full != 8:
        candidates.append(full)  # grid=1: block == array, any sublane count
    force_slim = os.environ.get("ISAACGYMENV_TPU_FUSED_SLIM", "") == "1"
    modes = ((True, 4),) if force_slim else ((False, 8),)
    for slim, per_pair in modes:
        V = base + per_pair * model.n_pairs
        for s in candidates:
            if V * s * LANES * 4 <= budget:
                return s, slim
    return None


def _block_s(num_envs: int, model: SimModel):
    mode = _pair_modes(num_envs, model)
    return None if mode is None else mode[0]


# ---------------------------------------------------------------------------
# scalar-SIMD helpers: values are (S, 128) arrays OR python-float constants;
# vectors/quats/matrices are python tuples of them.  Everything unrolls at
# trace time into elementwise VPU ops.
# ---------------------------------------------------------------------------


def _smin(a, b):
    """min() for mixed python-float / traced operands."""
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return min(a, b)
    return jnp.minimum(a, b)


def _vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _quat_to_R(q):
    """xyzw quat (4-tuple) -> 3x3 row-major nested tuple (maths.quat_to_rotmat)."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        (1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
        (2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)),
        (2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)),
    )


def _mmul(A, B):
    return tuple(
        tuple(sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3))
        for i in range(3)
    )


def _mvec(A, v):
    return tuple(sum(A[i][k] * v[k] for k in range(3)) for i in range(3))


def _mTvec(A, v):
    return tuple(sum(A[k][i] * v[k] for k in range(3)) for i in range(3))


def _rodrigues_static(axis, sn, cs):
    """Rotation about a STATIC unit axis (python floats) by traced angle."""
    ax, ay, az = (float(a) for a in axis)
    C = 1.0 - cs
    return (
        (cs + ax * ax * C, ax * ay * C - az * sn, ax * az * C + ay * sn),
        (ay * ax * C + az * sn, cs + ay * ay * C, ay * az * C - ax * sn),
        (az * ax * C - ay * sn, az * ay * C + ax * sn, cs + az * az * C),
    )


# spatial 6-vectors: tuple of 6 = [angular(3), linear(3)] (physics/spatial.py)


def _mot_to_child(R, p, m):
    """spatial.mot_to_child: parent-frame motion -> child frame."""
    w_p, v_p = m[:3], m[3:]
    w = _mTvec(R, w_p)
    v = _mTvec(R, _vsub(v_p, _cross(p, w_p)))
    return w + v


def _frc_to_parent(R, p, f):
    """spatial.frc_to_parent: child-frame force -> parent frame."""
    lin = _mvec(R, f[3:])
    n = _vadd(_mvec(R, f[:3]), _cross(p, lin))
    return n + lin


def _crm(v, m):
    """spatial motion cross product v x m."""
    w, vl = v[:3], v[3:]
    mw, mv = m[:3], m[3:]
    return _cross(w, mw) + _vadd(_cross(w, mv), _cross(vl, mw))


def _crf(v, f):
    """spatial force cross product v x* f."""
    w, vl = v[:3], v[3:]
    return _vadd(_cross(w, f[:3]), _cross(vl, f[3:])) + _cross(w, f[3:])


def _spatial_inertia_const(mass, com, inertia_com):
    """spatial.spatial_inertia for STATIC params -> 6x6 numpy about body origin."""
    m = float(mass)
    c = np.asarray(com, np.float64)
    cx = np.array([[0, -c[2], c[1]], [c[2], 0, -c[0]], [-c[1], c[0], 0.0]])
    I = np.zeros((6, 6))
    I[:3, :3] = np.asarray(inertia_com) + m * cx @ cx.T
    I[:3, 3:] = m * cx
    I[3:, :3] = m * cx.T
    I[3:, 3:] = m * np.eye(3)
    return I


def _inertia_to_parent(R, p, I):
    """spatial.inertia_to_parent (Xf(c->p) I Xm(p->c)) via 3x3 blocks:
    with E=R A R^T, F=R B R^T, G=R C R^T, H=R D R^T and px=skew(p):
      A' = E - F px + px G - px H px;  B' = F + px H
      C' = G - H px;                   D' = H
    """
    A = [[I[i][j] for j in range(3)] for i in range(3)]
    B = [[I[i][3 + j] for j in range(3)] for i in range(3)]
    C = [[I[3 + i][j] for j in range(3)] for i in range(3)]
    D = [[I[3 + i][3 + j] for j in range(3)] for i in range(3)]

    def conj(M):  # R M R^T
        RM = _mmul(R, M)
        return tuple(
            tuple(sum(RM[i][k] * R[j][k] for k in range(3)) for j in range(3))
            for i in range(3)
        )

    E, F, G, H = conj(A), conj(B), conj(C), conj(D)
    p0, p1, p2 = p

    def skew_mul(M):  # px @ M
        return (
            tuple(-p2 * M[1][j] + p1 * M[2][j] for j in range(3)),
            tuple(p2 * M[0][j] - p0 * M[2][j] for j in range(3)),
            tuple(-p1 * M[0][j] + p0 * M[1][j] for j in range(3)),
        )

    def mul_skew(M):  # M @ px
        return tuple(
            (
                M[i][1] * p2 - M[i][2] * p1,
                M[i][2] * p0 - M[i][0] * p2,
                M[i][0] * p1 - M[i][1] * p0,
            )
            for i in range(3)
        )

    def madd(sign_Ms):
        return tuple(
            tuple(sum(s * M[i][j] for s, M in sign_Ms) for j in range(3))
            for i in range(3)
        )

    pxG = skew_mul(G)
    Fpx = mul_skew(F)
    pxHpx = mul_skew(skew_mul(H))
    Ap = madd([(1.0, E), (1.0, pxG), (-1.0, Fpx), (-1.0, pxHpx)])
    Bp = madd([(1.0, F), (1.0, skew_mul(H))])
    Cp = madd([(1.0, G), (-1.0, mul_skew(H))])
    return tuple(
        tuple(
            (Ap[i][j] if i < 3 and j < 3 else
             Bp[i][j - 3] if i < 3 else
             Cp[i - 3][j] if j < 3 else
             H[i - 3][j - 3])
            for j in range(6)
        )
        for i in range(6)
    )


def _chol_solve6(A, b):
    """Solve A x = b for symmetric positive-definite 6x6 (unrolled Cholesky)."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return tuple(x)


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------


def build_fused_substep(
    model: SimModel, dt: float, substeps: int, num_envs: int,
    interpret: bool = False, terrain_mode: bool = False,
    wrench_mode: bool = False, fric_mode: bool = False,
    mass_mode: bool = False, dof_mode: bool = False, grav_mode: bool = False,
):
    """Return fn(q, qd, pos_target, vel_target, effort, *extras) ->
    (q_new, qd_new, dof_force, contact_force, contact_torque, joint_wrench).

    Optional input modes (extras appended in this order):
    - terrain_mode: per-geom ground height (N, ng) + normal (N, ng, 3),
      sampled by the caller ONCE per engine.step at current geom positions
      and held across the inner substeps.  Documented deviation vs the XLA
      path's per-substep lookup: geoms move <~ v*dt (mm-cm) within one
      control step, below the heightfield cell size the reference collides
      against (ref: anymal_terrain.py trimesh from 10 cm heightfield cells).
    - wrench_mode: per-body external wrench (N, nb, 6) world [n, f]
      (apply_rigid_body_force_tensors equivalent: pushes, rotor thrust).
    - fric_mode: per-env geom friction (N, ng) (AnymalTerrain's per-env
      friction buckets, ref: :235-239).
    - mass_mode: DR-batched per-env body masses (N, nb) + geom effective
      masses (N, ng).  Spatial inertias decompose as I(m) = A + m*C with
      A (rotational, from body_inertia) and C (mass-normalized COM terms)
      static — per-env masses cost one FMA per inertia entry.
    - dof_mode: DR-batched per-env dof stiffness/damping/lower/upper
      (N, nd) each (cfg randomization_params dof_properties).
    - grav_mode: DR-batched per-env gravity (N, 3) (sim_params gravity DR).
    """
    nb, nq, nv, nd, ng = model.nb, model.nq, model.nv, model.nd, model.ng
    mode = _pair_modes(num_envs, model)
    if mode is None:
        raise ValueError(
            "no Mosaic-valid sublane block fits VMEM for this scene — "
            "fused_ok should have routed it to the XLA path"
        )
    S, slim_pairs = mode
    use_ground = not model.no_ground
    grid = num_envs // (S * LANES)
    h = float(dt)

    # ---- static model constants (leaves covered by an input mode are NOT
    # read here — they may be tracers)
    jtype, parent = model.jtype, model.parent
    q_adr, v_adr = model.q_adr, model.v_adr
    g_vec = None if grav_mode else np.asarray(model.gravity, np.float64)
    joint_pos_c = np.asarray(model.joint_pos, np.float64)
    joint_quat_c = np.asarray(model.joint_quat, np.float64)
    joint_axis_c = np.asarray(model.joint_axis, np.float64)
    R_tree_c = [
        tuple(tuple(float(v) for v in row) for row in
              np.asarray(_quat_to_R(tuple(joint_quat_c[i])), np.float64))
        for i in range(nb)
    ]
    if mass_mode:
        # I(m) = A + m*C: A = rotational inertia about the COM placed at the
        # body origin frame; C = d(spatial inertia)/d(mass) (COM-only terms)
        I_A_const, I_C_const = [], []
        for i in range(nb):
            com_i = np.asarray(model.body_com)[i]
            inert_i = np.asarray(model.body_inertia)[i]
            C = _spatial_inertia_const(1.0, com_i, np.zeros((3, 3)))
            A = _spatial_inertia_const(0.0, com_i, inert_i)
            I_A_const.append(tuple(tuple(float(v) for v in row) for row in A))
            I_C_const.append(tuple(tuple(float(v) for v in row) for row in C))
        I_const = None
    else:
        I_const = [
            tuple(tuple(float(v) for v in row) for row in _spatial_inertia_const(
                np.asarray(model.body_mass)[i],
                np.asarray(model.body_com)[i],
                np.asarray(model.body_inertia)[i],
            ))
            for i in range(nb)
        ]
    d_body = model.dof_body
    d_lower = None if dof_mode else np.asarray(model.dof_lower, np.float64)
    d_upper = None if dof_mode else np.asarray(model.dof_upper, np.float64)
    d_effort = np.asarray(model.dof_effort, np.float64)
    d_maxvel = np.asarray(model.dof_maxvel, np.float64)
    d_arm = np.asarray(model.dof_armature, np.float64)
    d_fric = np.asarray(model.dof_friction, np.float64)
    d_kp = None if dof_mode else np.asarray(model.dof_stiffness, np.float64)
    d_kd = None if dof_mode else np.asarray(model.dof_damping, np.float64)
    d_mode = np.asarray(model.dof_drive_mode)
    d_haslim = np.asarray(model.dof_has_limit)
    dof_of_body = {int(b): d for d, b in enumerate(d_body)}

    geom_body = model.geom_body
    geom_off = np.asarray(model.geom_offset, np.float64)
    geom_r = np.asarray(model.geom_radius, np.float64)
    geom_mu = None if fric_mode else np.asarray(model.geom_friction, np.float64)
    geom_meff = None if mass_mode else np.asarray(model.geom_meff, np.float64)
    _el_static = model.geom_meff_el is not None
    if _el_static:
        geom_meff_el = np.asarray(model.geom_meff_el, np.float64)
    else:
        # el follows meff: static copy, or the runtime input under mass_mode
        geom_meff_el = geom_meff
    kn_c = float(np.asarray(model.contact_stiffness))
    kd_c = float(np.asarray(model.contact_damping))
    kt_c = float(np.asarray(model.tangential_stiffness))
    sensors = list(model.sensor_body)
    ns = len(sensors)

    # pair contacts (static lists; ref contact.pair_contact_forces)
    n_pairs = model.n_pairs
    if n_pairs:
        pair_geom = list(model.pair_geom)
        pair_surf = list(model.pair_surf)
        surf_body = list(model.surf_body)
        surf_kind = list(model.surf_kind)
        surf_off_c = np.asarray(model.surf_offset, np.float64)
        surf_rotm_c = np.asarray(model.surf_rotm, np.float64)
        surf_size_c = np.asarray(model.surf_size, np.float64)
        surf_mu_c = np.asarray(model.surf_friction, np.float64)
        surf_meff_c = np.asarray(model.surf_meff, np.float64)
        surf_meff_el_c = (
            np.asarray(model.surf_meff_el, np.float64)
            if model.surf_meff_el is not None else surf_meff_c
        )
    # world anchors (ref contact.anchor_forces)
    anchors = list(model.anchor_body)
    if anchors:
        anchor_off_c = np.asarray(model.anchor_offset, np.float64)
        anchor_tgt_c = np.asarray(model.anchor_target, np.float64)
        anchor_meff_c = np.asarray(model.anchor_meff, np.float64)
    # per-body gravity compensation (engine._substep gravcomp block)
    gravcomp_c = (
        np.asarray(model.body_gravcomp, np.float64)
        if model.body_gravcomp is not None else None
    )
    body_com_c = np.asarray(model.body_com, np.float64)
    body_mass_c = None if mass_mode else np.asarray(model.body_mass, np.float64)
    # fixed tendons (engine.passive_force tendon block)
    tendons = list(model.tendon_dof)
    if tendons:
        tendon_coef_c = np.asarray(model.tendon_coef, np.float64)
        tendon_rng_c = np.asarray(model.tendon_range, np.float64)
        tendon_k_c = np.asarray(model.tendon_k, np.float64)
        tendon_d_c = np.asarray(model.tendon_d, np.float64)

    def kernel(*refs):
        it = iter(refs)
        q_ref, qd_ref, tgt_ref, vtgt_ref, eff_ref = (next(it) for _ in range(5))
        gh_ref = next(it) if terrain_mode else None
        gn_ref = next(it) if terrain_mode else None
        bw_ref = next(it) if wrench_mode else None
        fr_ref = next(it) if fric_mode else None
        bm_ref = next(it) if mass_mode else None   # body mass (nb,)
        me_ref = next(it) if mass_mode else None   # geom eff. mass (ng,)
        kp_ref = next(it) if dof_mode else None
        kd_ref = next(it) if dof_mode else None
        lo_ref = next(it) if dof_mode else None
        hi_ref = next(it) if dof_mode else None
        gv_ref = next(it) if grav_mode else None   # gravity (3,)
        # no_ground scenes carry no ground-slip state through the kernel
        sg_ref = next(it) if (ng and use_ground) else None  # slip (ng*3,)
        sp_ref = next(it) if n_pairs else None     # pair slip (n_pairs*3,)
        qo_ref, qdo_ref, dfo_ref, cf_ref, ct_ref = (next(it) for _ in range(5))
        jw_ref = next(it) if ns else None
        sgo_ref = next(it) if (ng and use_ground) else None
        spo_ref = next(it) if n_pairs else None
        q = [q_ref[i] for i in range(nq)]
        qd = [qd_ref[i] for i in range(nv)]
        tgt = [tgt_ref[i] for i in range(nd)]
        vtgt = [vtgt_ref[i] for i in range(nd)]
        eff = [eff_ref[i] for i in range(nd)]
        slip_g = (
            [
                (sg_ref[3 * g], sg_ref[3 * g + 1], sg_ref[3 * g + 2])
                for g in range(ng)
            ]
            if sg_ref is not None else []
        )
        slip_p = [
            (sp_ref[3 * p_], sp_ref[3 * p_ + 1], sp_ref[3 * p_ + 2])
            for p_ in range(n_pairs)
        ]
        zero = jnp.zeros_like(q_ref[0])

        def substep(q, qd, slip_g, slip_p):
            # ---------------- FK ----------------
            R_l = [None] * nb
            p_l = [None] * nb
            R_w = [None] * nb
            p_w = [None] * nb
            v = [None] * nb
            vJ = [None] * nb
            for i in range(nb):
                jt = jtype[i]
                qa, va = q_adr[i], v_adr[i]
                R_tree = R_tree_c[i]
                p_tree = tuple(float(x) for x in joint_pos_c[i])
                if jt == JT_FREE:
                    quat = (q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
                    R = _mmul(R_tree, _quat_to_R(quat))
                    p = _vadd(p_tree, _mvec(R_tree, (q[qa], q[qa + 1], q[qa + 2])))
                    vj = tuple(qd[va + k] for k in range(6))
                elif jt == JT_REVOLUTE:
                    ax = joint_axis_c[i]
                    R = _mmul(R_tree, _rodrigues_static(ax, jnp.sin(q[qa]), jnp.cos(q[qa])))
                    p = p_tree
                    vj = tuple(float(a) * qd[va] for a in ax) + (zero, zero, zero)
                elif jt == JT_PRISMATIC:
                    ax = joint_axis_c[i]
                    R = R_tree
                    p = _vadd(p_tree, _mvec(R_tree, tuple(float(a) * q[qa] for a in ax)))
                    vj = (zero, zero, zero) + tuple(float(a) * qd[va] for a in ax)
                else:  # FIXED
                    R, p, vj = R_tree, p_tree, (zero,) * 6
                R_l[i], p_l[i], vJ[i] = R, p, vj
                par = parent[i]
                if par < 0:
                    R_w[i], p_w[i], v[i] = R, p, vj
                else:
                    R_w[i] = _mmul(R_w[par], R)
                    p_w[i] = _vadd(p_w[par], _mvec(R_w[par], p))
                    v[i] = _vadd(_mot_to_child(R, p, v[par]), vj)

            # ------ contacts (ground plane; terrain_mode: per-geom local
            # plane from the caller-sampled height + normal) ------
            f_ext = [(zero,) * 6 for _ in range(nb)]
            cf_out = [(zero,) * 3 for _ in range(nb)]
            ct_out = [(zero,) * 3 for _ in range(nb)]
            vel_cache = {}

            def body_vel_w(b):
                if b not in vel_cache:
                    vel_cache[b] = (
                        _mvec(R_w[b], v[b][:3]), _mvec(R_w[b], v[b][3:])
                    )
                return vel_cache[b]

            # PASS 1 (ground): penetration queries + live per-body contact
            # counts (contact.body_active_counts parity: every contact's
            # effective-mass budget is divided by its body's active count).
            # Caches are SLIM (depth/active only; velocities and levers are
            # recomputed in pass 2) to keep the kernel's live VMEM set small.
            nact = [zero for _ in range(nb)]

            def _b2f(x):
                # a contact on a fully static body traces as a Python bool
                # (constant geometry), which has no .astype
                return x.astype(jnp.float32) if hasattr(x, "astype") else jnp.float32(x)

            geom_off_w = {}
            for g in range(ng):
                b = geom_body[g]
                geom_off_w[g] = _mvec(R_w[b], tuple(float(x) for x in geom_off[g]))
            ground_cache = []
            if use_ground:
                for g in range(ng):
                    b = geom_body[g]
                    off_w = geom_off_w[g]
                    pos_z = p_w[b][2] + off_w[2]
                    hgt = gh_ref[g] if terrain_mode else 0.0
                    depth = hgt + float(geom_r[g]) - pos_z
                    active = depth > 0.0
                    nact[b] = nact[b] + _b2f(active)
                    ground_cache.append((g, b, depth, active))

            # PASS 1 (pairs): geometry + activity (static pair list; mirrors
            # contact.pair_contact_forces — the closest-feature branch per
            # pair is selected at TRACE time from the static surface kind,
            # so each pair costs only its own geometry)
            def pair_query(pi):
                """(gb, sb, R_s, depth, n_w) surface query for pair pi.

                Called once per pass in slim mode (re-derives the geometry
                instead of caching it across the passes — ~4 fewer live
                registers per pair; see _pair_modes)."""
                g = pair_geom[pi]
                s_ = pair_surf[pi]
                gb_, sb_ = geom_body[g], surf_body[s_]
                c = _vadd(p_w[gb_], geom_off_w[g])  # sphere center, world
                # surface frame in world
                Rm = tuple(tuple(float(x) for x in row) for row in surf_rotm_c[s_])
                R_s = _mmul(R_w[sb_], Rm)
                soff = _mvec(R_w[sb_], tuple(float(x) for x in surf_off_c[s_]))
                p_s = _vadd(p_w[sb_], soff)
                local = _mTvec(R_s, _vsub(c, p_s))
                sz = surf_size_c[s_]
                kind = surf_kind[s_]
                eps = 1e-9
                if kind == 0:  # sphere
                    dist_c = jnp.sqrt(local[0] ** 2 + local[1] ** 2 + local[2] ** 2)
                    inv = 1.0 / jnp.maximum(dist_c, eps)
                    n_l = tuple(local[k] * inv for k in range(3))
                    d_surf = dist_c - float(sz[0])
                elif kind == 1:  # box (half extents)
                    half = tuple(float(x) for x in sz)
                    qv = tuple(jnp.clip(local[k], -half[k], half[k]) for k in range(3))
                    delta = _vsub(local, qv)
                    dist_out = jnp.sqrt(delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2)
                    inv = 1.0 / jnp.maximum(dist_out, eps)
                    n_out = tuple(delta[k] * inv for k in range(3))
                    face = tuple(half[k] - jnp.abs(local[k]) for k in range(3))
                    # nearest inside face (argmin over 3 via pairwise where)
                    m01 = jnp.minimum(face[0], face[1])
                    d_in = -jnp.minimum(m01, face[2])
                    pick0 = (face[0] <= face[1]) & (face[0] <= face[2])
                    pick1 = (~pick0) & (face[1] <= face[2])
                    n_in = (
                        jnp.where(pick0, jnp.sign(local[0]), 0.0),
                        jnp.where(pick1, jnp.sign(local[1]), 0.0),
                        jnp.where(~(pick0 | pick1), jnp.sign(local[2]), 0.0),
                    )
                    inside = dist_out <= eps
                    n_l = tuple(jnp.where(inside, n_in[k], n_out[k]) for k in range(3))
                    d_surf = jnp.where(inside, d_in, dist_out)
                elif kind == 2:  # capsule [R, half_len], axis local z
                    seg_z = jnp.clip(local[2], -float(sz[1]), float(sz[1]))
                    d_vec = (local[0], local[1], local[2] - seg_z)
                    dist_seg = jnp.sqrt(d_vec[0] ** 2 + d_vec[1] ** 2 + d_vec[2] ** 2)
                    inv = 1.0 / jnp.maximum(dist_seg, eps)
                    n_l = tuple(d_vec[k] * inv for k in range(3))
                    d_surf = dist_seg - float(sz[0])
                else:  # capped cylinder [R, half_len]
                    rho = jnp.sqrt(local[0] ** 2 + local[1] ** 2)
                    inv_rho = 1.0 / jnp.maximum(rho, eps)
                    rdir = (local[0] * inv_rho, local[1] * inv_rho)
                    dr = rho - float(sz[0])
                    dz = jnp.abs(local[2]) - float(sz[1])
                    out_r = jnp.maximum(dr, 0.0)
                    out_z = jnp.maximum(dz, 0.0)
                    d_out = jnp.sqrt(out_r * out_r + out_z * out_z)
                    d_in = jnp.maximum(dr, dz)
                    d_surf = jnp.where(d_in < 0, d_in, d_out)
                    szn = jnp.sign(local[2])
                    inv_do = 1.0 / jnp.maximum(d_out, eps)
                    n_out3 = (out_r * rdir[0] * inv_do, out_r * rdir[1] * inv_do,
                              out_z * szn * inv_do)
                    cap_in = dz > dr
                    n_in3 = (
                        jnp.where(cap_in, 0.0, rdir[0]),
                        jnp.where(cap_in, 0.0, rdir[1]),
                        jnp.where(cap_in, szn, 0.0),
                    )
                    n_l = tuple(
                        jnp.where(d_in < 0, n_in3[k], n_out3[k]) for k in range(3)
                    )
                n_w = _mvec(R_s, n_l)  # world, away from surface
                depth = float(geom_r[g]) - d_surf
                return g, gb_, sb_, depth, n_w

            pair_cache = []
            for pi in range(n_pairs):
                g, gb_, sb_, depth, n_w = pair_query(pi)
                active = depth > 0.0
                nact[gb_] = nact[gb_] + _b2f(active)
                nact[sb_] = nact[sb_] + _b2f(active)
                if slim_pairs:
                    # keep only the activity bit live across the passes;
                    # pass 2 re-derives the geometry (see _pair_modes)
                    pair_cache.append((g, gb_, sb_, active))
                else:
                    pair_cache.append((g, gb_, sb_, depth, active, n_w))

            # live share factors (1/max(count, 1) per body with any contact)
            inv_nact = {}
            for b in set(
                [geom_body[g] for g in range(ng)]
                + ([geom_body[pair_geom[pi]] for pi in range(n_pairs)]
                   + [surf_body[pair_surf[pi]] for pi in range(n_pairs)]
                   if n_pairs else [])
            ):
                inv_nact[b] = 1.0 / jnp.maximum(nact[b], 1.0)

            # PASS 2 (ground): forces with renormalized budgets
            slip_g_new = list(slip_g)
            for g, b, depth, active in ground_cache:
                off_w = geom_off_w[g]
                ang_w, lin_w = body_vel_w(b)
                if terrain_mode:
                    n_g = (gn_ref[3 * g], gn_ref[3 * g + 1], gn_ref[3 * g + 2])
                else:
                    n_g = (0.0, 0.0, 1.0)
                r_g = float(geom_r[g])
                # material velocity at the CONTACT POINT (sphere bottom):
                # rolling spheres have zero slip there (engine parity)
                lever = tuple(off_w[k] - r_g * n_g[k] for k in range(3))
                vel = _vadd(lin_w, _cross(ang_w, lever))
                share = inv_nact[b]
                meff_g = (me_ref[g] if mass_mode else float(geom_meff[g])) * share
                arrest = 0.25 * meff_g / h
                arrest_n = 1.0 * meff_g / h  # deadbeat normal cap (engine parity)
                if _el_static:
                    kn_eff = jnp.minimum(
                        kn_c, float(geom_meff_el[g]) * share / (h * h)
                    )
                elif mass_mode:
                    kn_eff = jnp.minimum(kn_c, meff_g / (h * h))
                else:
                    kn_eff = jnp.minimum(
                        kn_c, float(geom_meff_el[g]) * share / (h * h)
                    )
                d_pos = jnp.minimum(jnp.maximum(depth, 0.0), 0.05)
                v_n = vel[0] * n_g[0] + vel[1] * n_g[1] + vel[2] * n_g[2]
                v_t = tuple(vel[k] - v_n * n_g[k] for k in range(3))
                # signed Hunt-Crossley damping, no adhesion (engine parity)
                f_damp = jnp.minimum(kd_c * d_pos, arrest_n) * (-v_n)
                fn = jnp.where(
                    active, jnp.maximum(kn_eff * d_pos + f_damp, 0.0), 0.0
                )
                mu = fr_ref[g] if fric_mode else float(geom_mu[g])
                # anchored-spring stiction (contact.stiction_force parity)
                kt_el = _smin(kt_c, meff_g / (h * h))
                ct_ = _smin(arrest, kt_c)
                s = slip_g[g]
                s = tuple(s[k] + v_t[k] * h for k in range(3))
                s_dot_n = s[0] * n_g[0] + s[1] * n_g[1] + s[2] * n_g[2]
                s = tuple(s[k] - s_dot_n * n_g[k] for k in range(3))
                f_tr = tuple(-kt_el * s[k] - ct_ * v_t[k] for k in range(3))
                f_mag = jnp.sqrt(
                    f_tr[0] * f_tr[0] + f_tr[1] * f_tr[1] + f_tr[2] * f_tr[2]
                )
                f_max = mu * fn
                clamp = f_mag > f_max
                scale = jnp.where(clamp, f_max / jnp.maximum(f_mag, 1e-9), 1.0)
                f_t = tuple(f_tr[k] * scale for k in range(3))
                inv_kt = 1.0 / jnp.maximum(kt_el, 1e-9)
                s_new = tuple(
                    jnp.where(
                        active,
                        jnp.where(clamp, -f_t[k] * inv_kt, s[k]),
                        0.0,
                    )
                    for k in range(3)
                )
                slip_g_new[g] = s_new
                f_w = tuple(
                    fn * n_g[k] + jnp.where(active, f_t[k], 0.0)
                    for k in range(3)
                )
                torque = _cross(lever, f_w)
                f_ext[b] = _vadd(f_ext[b], torque + f_w)
                cf_out[b] = _vadd(cf_out[b], f_w)
                ct_out[b] = _vadd(ct_out[b], torque)

            # PASS 2 (pairs): levers/velocities recomputed from the cached
            # contact normal (cheap vs caching them across the passes); in
            # slim mode the depth/normal themselves are re-derived too
            slip_p_new = list(slip_p)
            for pi, entry in enumerate(pair_cache):
                if slim_pairs:
                    g, gb_, sb_, active = entry
                    _, _, _, depth, n_w = pair_query(pi)
                else:
                    g, gb_, sb_, depth, active, n_w = entry
                s_ = pair_surf[pi]
                c = _vadd(p_w[gb_], geom_off_w[g])
                r_g = float(geom_r[g])
                x_c = tuple(c[k] - n_w[k] * r_g for k in range(3))
                lever_g = _vsub(x_c, p_w[gb_])
                lever_s = _vsub(x_c, p_w[sb_])
                ag, lg = body_vel_w(gb_)
                as_, ls = body_vel_w(sb_)
                v_g = _vadd(lg, _cross(ag, lever_g))
                v_s = _vadd(ls, _cross(as_, lever_s))
                v_rel = _vsub(v_g, v_s)
                v_n = v_rel[0] * n_w[0] + v_rel[1] * n_w[1] + v_rel[2] * n_w[2]
                v_t = tuple(v_rel[k] - v_n * n_w[k] for k in range(3))
                share_g = inv_nact[gb_]
                share_s = inv_nact[sb_]
                m_g_ = (me_ref[g] if mass_mode else float(geom_meff[g])) * share_g
                m_s_ = float(surf_meff_c[s_]) * share_s
                m_pair = m_g_ * m_s_ / (m_g_ + m_s_)
                arrest = 0.25 * m_pair / h
                arrest_n = 1.0 * m_pair / h  # deadbeat normal cap (engine parity)
                ms_el = float(surf_meff_el_c[s_]) * share_s
                if _el_static:
                    mg_el = float(geom_meff_el[g]) * share_g
                elif mass_mode:
                    mg_el = m_g_
                else:
                    mg_el = float(geom_meff_el[g]) * share_g
                kn_eff = jnp.minimum(
                    kn_c, mg_el * ms_el / (mg_el + ms_el) / (h * h)
                )
                d_pos = jnp.minimum(jnp.maximum(depth, 0.0), 0.05)
                # signed Hunt-Crossley damping, no adhesion (engine parity)
                f_damp = jnp.minimum(kd_c * d_pos, arrest_n) * (-v_n)
                fn = jnp.where(
                    active, jnp.maximum(kn_eff * d_pos + f_damp, 0.0), 0.0
                )
                if fric_mode:
                    mu = jnp.sqrt(fr_ref[g] * float(surf_mu_c[s_]))
                else:
                    mu = float(np.sqrt(geom_mu[g] * surf_mu_c[s_]))
                # anchored-spring stiction on the pair's reduced mass
                # (contact.pair_contact_forces parity)
                kt_el = _smin(kt_c, m_pair / (h * h))
                ct_ = _smin(arrest, kt_c)
                s = slip_p[pi]
                s = tuple(s[k] + v_t[k] * h for k in range(3))
                s_dot_n = s[0] * n_w[0] + s[1] * n_w[1] + s[2] * n_w[2]
                s = tuple(s[k] - s_dot_n * n_w[k] for k in range(3))
                f_tr = tuple(-kt_el * s[k] - ct_ * v_t[k] for k in range(3))
                f_mag = jnp.sqrt(
                    f_tr[0] * f_tr[0] + f_tr[1] * f_tr[1] + f_tr[2] * f_tr[2]
                )
                f_max = mu * fn
                clamp = f_mag > f_max
                scale = jnp.where(clamp, f_max / jnp.maximum(f_mag, 1e-9), 1.0)
                f_t = tuple(f_tr[k] * scale for k in range(3))
                inv_kt = 1.0 / jnp.maximum(kt_el, 1e-9)
                slip_p_new[pi] = tuple(
                    jnp.where(
                        active,
                        jnp.where(clamp, -f_t[k] * inv_kt, s[k]),
                        0.0,
                    )
                    for k in range(3)
                )
                f_p = tuple(
                    fn * n_w[k] + jnp.where(active, f_t[k], 0.0)
                    for k in range(3)
                )
                tq_g = _cross(lever_g, f_p)
                f_n = tuple(-f_p[k] for k in range(3))
                tq_s = _cross(lever_s, f_n)
                f_ext[gb_] = _vadd(f_ext[gb_], tq_g + f_p)
                f_ext[sb_] = _vadd(f_ext[sb_], tq_s + f_n)
                cf_out[gb_] = _vadd(cf_out[gb_], f_p)
                cf_out[sb_] = _vadd(cf_out[sb_], f_n)
                ct_out[gb_] = _vadd(ct_out[gb_], tq_g)
                ct_out[sb_] = _vadd(ct_out[sb_], tq_s)

            # ------ world anchors (contact.anchor_forces: momentum-capped
            # Baumgarte point constraints) ------
            for ai, ab in enumerate(anchors):
                off_a = _mvec(R_w[ab], tuple(float(x) for x in anchor_off_c[ai]))
                p_a = _vadd(p_w[ab], off_a)
                aw, lw = body_vel_w(ab)
                v_a = _vadd(lw, _cross(aw, off_a))
                m_a = float(anchor_meff_c[ai])
                kp_a = 0.2 * m_a / (h * h)
                kd_a = 0.7 * m_a / h
                a_tgt = tuple(float(x) for x in anchor_tgt_c[ai])
                f_a = tuple(
                    -kp_a * (p_a[k] - a_tgt[k]) - kd_a * v_a[k] for k in range(3)
                )
                tq_a = _cross(off_a, f_a)
                f_ext[ab] = _vadd(f_ext[ab], tq_a + f_a)

            # ------ per-body gravity compensation (engine gravcomp block) --
            if gravcomp_c is not None:
                g3 = (
                    (gv_ref[0], gv_ref[1], gv_ref[2]) if grav_mode
                    else tuple(float(g_) for g_ in g_vec)
                )
                for b in range(nb):
                    if float(gravcomp_c[b]) == 0.0:
                        continue
                    m_b = bm_ref[b] if mass_mode else float(body_mass_c[b])
                    gc = float(gravcomp_c[b]) * m_b
                    f_g = tuple(-gc * g3[k] for k in range(3))
                    com_w = _mvec(R_w[b], tuple(float(x) for x in body_com_c[b]))
                    tq_g = _cross(com_w, f_g)
                    f_ext[b] = _vadd(
                        f_ext[b], tuple(tq_g[k] + zero for k in range(3)) + f_g
                    )

            # engine parity: contact_torque is the TOTAL external moment
            # (ground + pair + anchor + gravcomp) excluding the commanded
            # wrench (engine._substep contact_torque line)
            for b in range(nb):
                ct_out[b] = tuple(f_ext[b][k] + zero for k in range(3))
            if wrench_mode:
                for b in range(nb):
                    w6 = tuple(bw_ref[b * 6 + k] for k in range(6))
                    f_ext[b] = _vadd(f_ext[b], w6)

            # ---------------- joint forces + implicit diagonal ----------
            tau_d = [None] * nd
            d_extra = [None] * nd
            for d in range(nd):
                b = d_body[d]
                dp, dv = q[q_adr[b]], qd[v_adr[b]]
                mode = int(d_mode[d])
                if dof_mode:
                    kp, kd_ = kp_ref[d], kd_ref[d]
                else:
                    kp, kd_ = float(d_kp[d]), float(d_kd[d])
                if mode == DRIVE_POS:
                    tau_a = kp * (tgt[d] - dp) - kd_ * dv
                elif mode == DRIVE_VEL:
                    tau_a = kd_ * (vtgt[d] - dv)
                elif mode == DRIVE_EFFORT:
                    tau_a = eff[d]
                else:
                    tau_a = zero
                lim = float(d_effort[d])
                tau_a = jnp.clip(tau_a, -lim, lim)
                if dof_mode:
                    lo, hi = lo_ref[d], hi_ref[d]
                else:
                    lo, hi = float(d_lower[d]), float(d_upper[d])
                fr = float(d_fric[d])
                if bool(d_haslim[d]):
                    below = jnp.minimum(dp - lo, 0.0)
                    above = jnp.maximum(dp - hi, 0.0)
                    at_lim = ((below < 0.0) | (above > 0.0)).astype(dp.dtype)
                    tau_p = -_LIMIT_STIFFNESS * (below + above) - _LIMIT_DAMPING * dv * at_lim
                    kp_imp = _LIMIT_STIFFNESS * at_lim
                    kd_imp = _LIMIT_DAMPING * at_lim
                else:
                    tau_p = zero
                    kp_imp = 0.0
                    kd_imp = 0.0
                tau_p = tau_p - fr * jnp.tanh(dv / _FRICTION_VEL_EPS)
                if mode in (DRIVE_NONE, DRIVE_EFFORT):
                    tau_p = tau_p - kd_ * dv
                kp_drive = kp if mode == DRIVE_POS else 0.0
                d_extra[d] = (
                    h * (kd_ + kd_imp + fr / _FRICTION_VEL_EPS)
                    + h * h * (kp_drive + kp_imp)
                )
                tau_d[d] = tau_a + tau_p

            # fixed tendons: L = sum(coef*q) range-limit springs
            # (engine.passive_force tendon block; shadow-hand distal couplings)
            for ti, td in enumerate(tendons):
                coefs = [float(c_) for c_ in tendon_coef_c[ti]]
                dpos = [q[q_adr[d_body[dd]]] for dd in td]
                dvel = [qd[v_adr[d_body[dd]]] for dd in td]
                L = sum(c_ * p_ for c_, p_ in zip(coefs, dpos))
                Ld = sum(c_ * v_ for c_, v_ in zip(coefs, dvel))
                lo_t, hi_t = float(tendon_rng_c[ti][0]), float(tendon_rng_c[ti][1])
                viol = jnp.maximum(L - hi_t, 0.0) + jnp.minimum(L - lo_t, 0.0)
                f_t = (
                    -float(tendon_k_c[ti]) * viol
                    - float(tendon_d_c[ti]) * Ld * (jnp.abs(viol) > 0)
                )
                for c_, dd in zip(coefs, td):
                    tau_d[dd] = tau_d[dd] + f_t * c_

            # ---------------- ABA (mirrors dynamics.aba) ----------------
            IA = [None] * nb
            pA = [None] * nb
            c_b = [None] * nb
            for i in range(nb):
                if mass_mode:
                    # I(m) = A + m*C with A/C static; per-env mass from input
                    Ac, Cc = I_A_const[i], I_C_const[i]
                    m_i = bm_ref[i]
                    IA[i] = [
                        [
                            (Ac[r][cc] + m_i * Cc[r][cc])
                            if Cc[r][cc] != 0.0 else Ac[r][cc]
                            for cc in range(6)
                        ]
                        for r in range(6)
                    ]
                else:
                    Ic = I_const[i]
                    IA[i] = [[Ic[r][cc] for cc in range(6)] for r in range(6)]
                Ic = IA[i]
                c_b[i] = _crm(v[i], vJ[i])
                Iv = tuple(sum(Ic[r][k] * v[i][k] for k in range(6)) for r in range(6))
                pA_i = list(_crf(v[i], Iv))
                n_b = _mTvec(R_w[i], f_ext[i][:3])
                f_b = _mTvec(R_w[i], f_ext[i][3:])
                for k in range(3):
                    pA_i[k] = pA_i[k] - n_b[k]
                    pA_i[3 + k] = pA_i[3 + k] - f_b[k]
                pA[i] = tuple(pA_i)

            U = [None] * nb
            dinv = [None] * nb
            u_ = [None] * nb
            S_ax = [None] * nb
            for i in reversed(range(nb)):
                jt = jtype[i]
                par = parent[i]
                if jt == JT_FREE:
                    Ia = pa = None
                elif jt == JT_FIXED:
                    Ia = IA[i]
                    pa = tuple(
                        pA[i][r] + sum(IA[i][r][k] * c_b[i][k] for k in range(6))
                        for r in range(6)
                    )
                else:
                    d = dof_of_body[i]
                    ax = joint_axis_c[i]
                    if jt == JT_REVOLUTE:
                        Scol = tuple(float(a) for a in ax) + (0.0, 0.0, 0.0)
                    else:
                        Scol = (0.0, 0.0, 0.0) + tuple(float(a) for a in ax)
                    nz = [k for k in range(6) if Scol[k] != 0.0]
                    S_ax[i] = Scol
                    Ui = tuple(
                        sum(IA[i][r][k] * Scol[k] for k in nz) for r in range(6)
                    )
                    di = sum(Scol[k] * Ui[k] for k in nz) + float(d_arm[d]) + d_extra[d]
                    ui = tau_d[d] - sum(Scol[k] * pA[i][k] for k in nz)
                    U[i], u_[i] = Ui, ui
                    dinv[i] = 1.0 / di
                    Ia = [
                        [IA[i][r][cc] - Ui[r] * Ui[cc] * dinv[i] for cc in range(6)]
                        for r in range(6)
                    ]
                    pa = tuple(
                        pA[i][r]
                        + sum(Ia[r][k] * c_b[i][k] for k in range(6))
                        + Ui[r] * (ui * dinv[i])
                        for r in range(6)
                    )
                if par >= 0:
                    Ia_p = _inertia_to_parent(R_l[i], p_l[i], Ia)
                    pa_p = _frc_to_parent(R_l[i], p_l[i], pa)
                    IA[par] = [
                        [IA[par][r][cc] + Ia_p[r][cc] for cc in range(6)]
                        for r in range(6)
                    ]
                    pA[par] = tuple(pA[par][r] + pa_p[r] for r in range(6))

            if grav_mode:
                g6 = (0.0, 0.0, 0.0, -gv_ref[0], -gv_ref[1], -gv_ref[2])
            else:
                g6 = (
                    0.0, 0.0, 0.0,
                    float(-g_vec[0]), float(-g_vec[1]), float(-g_vec[2]),
                )
            qdd = [zero] * nv
            a_b = [None] * nb
            for i in range(nb):
                jt = jtype[i]
                par = parent[i]
                if par < 0:
                    a_par = _mot_to_child(R_w[i], p_w[i], g6)
                else:
                    a_par = _mot_to_child(R_l[i], p_l[i], a_b[par])
                a_p = _vadd(a_par, c_b[i])
                va = v_adr[i]
                if jt == JT_FREE:
                    rhs = tuple(
                        -(pA[i][k] + sum(IA[i][k][m] * a_p[m] for m in range(6)))
                        for k in range(6)
                    )
                    sol = _chol_solve6(IA[i], rhs)
                    for k in range(6):
                        qdd[va + k] = sol[k]
                    a_b[i] = _vadd(a_p, sol)
                elif jt == JT_FIXED:
                    a_b[i] = a_p
                else:
                    qdd_i = (u_[i] - sum(U[i][k] * a_p[k] for k in range(6))) * dinv[i]
                    qdd[va] = qdd_i
                    a_b[i] = tuple(a_p[k] + S_ax[i][k] * qdd_i for k in range(6))

            # force-sensor wrenches: f_i = IA_i a_i + pA_i, packed [f, n]
            # (ref: acquire_force_sensor_tensor layout)
            jw = []
            for b in sensors:
                fj = tuple(
                    sum(IA[b][r][k] * a_b[b][k] for k in range(6)) + pA[b][r]
                    for r in range(6)
                )
                jw.append(fj[3:] + fj[:3])

            # ---------------- integrate (mirrors engine._integrate) ------
            qd_new = [qd[k] + qdd[k] * h for k in range(nv)]
            for d in range(nd):
                va = v_adr[d_body[d]]
                mv = float(d_maxvel[d])
                qd_new[va] = jnp.clip(qd_new[va], -mv, mv)
            # free-root velocity clamp (engine._clamp_root_vel parity): the
            # PhysX per-body max_angular/linear_velocity guard that bounds
            # energy injection from pathological multi-contact states
            for b in range(nb):
                if jtype[b] != JT_FREE:
                    continue
                va = v_adr[b]
                for k in range(3):
                    qd_new[va + k] = jnp.clip(
                        qd_new[va + k], -_MAX_ROOT_ANGVEL, _MAX_ROOT_ANGVEL
                    )
                    qd_new[va + 3 + k] = jnp.clip(
                        qd_new[va + 3 + k], -_MAX_ROOT_LINVEL, _MAX_ROOT_LINVEL
                    )
            q_new = list(q)
            for b in range(nb):
                if jtype[b] != JT_FREE:
                    continue
                qa, va = q_adr[b], v_adr[b]
                quat = (q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
                Rq = _quat_to_R(quat)
                om_w = _mvec(Rq, (qd_new[va], qd_new[va + 1], qd_new[va + 2]))
                v_w = _mvec(Rq, (qd_new[va + 3], qd_new[va + 4], qd_new[va + 5]))
                for k in range(3):
                    q_new[qa + k] = q_new[qa + k] + v_w[k] * h
                ang = jnp.sqrt(om_w[0] ** 2 + om_w[1] ** 2 + om_w[2] ** 2)
                half = 0.5 * ang * h
                kf = jnp.where(
                    ang > 1e-9, jnp.sin(half) / jnp.maximum(ang, 1e-9), 0.5 * h
                )
                x1, y1, z1 = om_w[0] * kf, om_w[1] * kf, om_w[2] * kf
                w1 = jnp.cos(half)
                x2, y2, z2, w2 = quat
                qx = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
                qy = w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2
                qz = w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2
                qw = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
                inv = 1.0 / jnp.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
                q_new[qa + 3] = qx * inv
                q_new[qa + 4] = qy * inv
                q_new[qa + 5] = qz * inv
                q_new[qa + 6] = qw * inv
            for d in range(nd):
                b = d_body[d]
                q_new[q_adr[b]] = q_new[q_adr[b]] + qd_new[v_adr[b]] * h
            return (q_new, qd_new, tau_d, cf_out, ct_out, jw,
                    slip_g_new, slip_p_new)

        tau_last = [zero] * nd
        cf_last = [(zero,) * 3] * nb
        ct_last = [(zero,) * 3] * nb
        jw_last = [(zero,) * 6] * ns
        for _ in range(substeps):
            (q, qd, tau_last, cf_last, ct_last, jw_last,
             slip_g, slip_p) = substep(q, qd, slip_g, slip_p)
        for i in range(nq):
            qo_ref[i] = q[i]
        for i in range(nv):
            qdo_ref[i] = qd[i]
        for d in range(nd):
            dfo_ref[d] = tau_last[d]
        for b in range(nb):
            for k in range(3):
                cf_ref[b * 3 + k] = cf_last[b][k] + zero
                ct_ref[b * 3 + k] = ct_last[b][k] + zero
        for s_i in range(ns):
            for k in range(6):
                jw_ref[s_i * 6 + k] = jw_last[s_i][k] + zero
        if sgo_ref is not None:
            for g in range(ng):
                for k in range(3):
                    sgo_ref[3 * g + k] = slip_g[g][k] + zero
        for p_ in range(n_pairs):
            for k in range(3):
                spo_ref[3 * p_ + k] = slip_p[p_][k] + zero

    def to_soa(x, d):
        return jnp.moveaxis(x, -1, 0).reshape(d, num_envs // LANES, LANES)

    def from_soa(x):
        d = x.shape[0]
        return jnp.moveaxis(x.reshape(d, num_envs), 0, -1)

    def spec(d):
        return pl.BlockSpec(
            (d, S, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    shape = lambda d: jax.ShapeDtypeStruct(
        (d, num_envs // LANES, LANES), jnp.float32
    )

    slip_g_io = bool(ng) and use_ground
    out_specs = [spec(nq), spec(nv), spec(nd), spec(nb * 3), spec(nb * 3)]
    out_shapes = [shape(nq), shape(nv), shape(nd), shape(nb * 3), shape(nb * 3)]
    if ns:
        out_specs.append(spec(ns * 6))
        out_shapes.append(shape(ns * 6))
    if slip_g_io:
        out_specs.append(spec(ng * 3))
        out_shapes.append(shape(ng * 3))
    if n_pairs:
        out_specs.append(spec(n_pairs * 3))
        out_shapes.append(shape(n_pairs * 3))
    in_specs = [spec(nq), spec(nv), spec(nd), spec(nd), spec(nd)]
    if terrain_mode:
        in_specs += [spec(ng), spec(ng * 3)]
    if wrench_mode:
        in_specs.append(spec(nb * 6))
    if fric_mode:
        in_specs.append(spec(ng))
    if mass_mode:
        in_specs += [spec(nb), spec(ng)]
    if dof_mode:
        in_specs += [spec(nd), spec(nd), spec(nd), spec(nd)]
    if grav_mode:
        in_specs.append(spec(3))
    # alias the state-carrying refs onto their outputs: q/qd/slip blocks
    # would otherwise be resident twice in VMEM (in + out), and the slip
    # blocks dominate big pair scenes (ShadowHand: 256 pairs x 3 lanes)
    io_aliases = {0: 0, 1: 1}
    if slip_g_io:
        io_aliases[len(in_specs)] = 5 + (1 if ns else 0)
        in_specs.append(spec(ng * 3))
    if n_pairs:
        io_aliases[len(in_specs)] = 5 + (1 if ns else 0) + (1 if slip_g_io else 0)
        in_specs.append(spec(n_pairs * 3))

    def run(q, qd, pos_target, vel_target, effort,
            ground_h=None, ground_n=None, body_wrench=None, geom_fric=None,
            body_mass=None, geom_meff=None, dof_kp=None, dof_kd=None,
            dof_lo=None, dof_hi=None, gravity=None,
            slip_g=None, slip_p=None):
        f32 = jnp.float32
        bcast = lambda x, d: to_soa(
            jnp.broadcast_to(x, (num_envs, d)).astype(f32), d
        )
        args = [
            to_soa(q.astype(f32), nq),
            to_soa(qd.astype(f32), nv),
            to_soa(pos_target.astype(f32), nd),
            to_soa(vel_target.astype(f32), nd),
            to_soa(effort.astype(f32), nd),
        ]
        if terrain_mode:
            args.append(to_soa(ground_h.astype(f32), ng))
            args.append(to_soa(ground_n.reshape(num_envs, ng * 3).astype(f32), ng * 3))
        if wrench_mode:
            args.append(to_soa(body_wrench.reshape(num_envs, nb * 6).astype(f32), nb * 6))
        if fric_mode:
            args.append(bcast(geom_fric, ng))
        if mass_mode:
            args.append(bcast(body_mass, nb))
            args.append(bcast(geom_meff, ng))
        if dof_mode:
            args.append(bcast(dof_kp, nd))
            args.append(bcast(dof_kd, nd))
            args.append(bcast(dof_lo, nd))
            args.append(bcast(dof_hi, nd))
        if grav_mode:
            args.append(bcast(gravity, 3))
        if slip_g_io:
            if slip_g is None:
                slip_g = jnp.zeros((num_envs, ng, 3), f32)
            args.append(to_soa(slip_g.reshape(num_envs, ng * 3).astype(f32), ng * 3))
        if n_pairs:
            if slip_p is None:
                slip_p = jnp.zeros((num_envs, n_pairs, 3), f32)
            args.append(to_soa(
                slip_p.reshape(num_envs, n_pairs * 3).astype(f32), n_pairs * 3
            ))
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            input_output_aliases=io_aliases,
            interpret=interpret,
        )(*args)
        q_new = from_soa(outs[0])
        qd_new = from_soa(outs[1])
        dof_force = from_soa(outs[2])
        cf = from_soa(outs[3]).reshape(num_envs, nb, 3)
        ct = from_soa(outs[4]).reshape(num_envs, nb, 3)
        o = 5
        jw = None
        if ns:
            jw = from_soa(outs[o]).reshape(num_envs, ns, 6)
            o += 1
        slip_g_new = slip_p_new = None
        if slip_g_io:
            slip_g_new = from_soa(outs[o]).reshape(num_envs, ng, 3)
            o += 1
        elif ng:
            # no_ground: ground slip never evolves — pass the state through
            slip_g_new = (
                slip_g if slip_g is not None
                else jnp.zeros((num_envs, ng, 3), f32)
            )
        if n_pairs:
            slip_p_new = from_soa(outs[o]).reshape(num_envs, n_pairs, 3)
        return q_new, qd_new, dof_force, cf, ct, jw, slip_g_new, slip_p_new

    return run
