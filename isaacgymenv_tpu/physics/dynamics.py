"""Batched articulated rigid-body dynamics: CRBA mass matrix, RNEA bias,
forward dynamics via Cholesky solve.

TPU-native replacement of the reference's PhysX GPU articulation pipeline
(SURVEY.md §2.1 row 1).  The CRBA route (vs ABA) is chosen deliberately: the
joint-space mass matrix and point Jacobians are first-class citizens because
the OSC tasks consume them directly (ref: tasks/useful_hound.py:448-455,
tasks/franka_cube_stack.py — `acquire_jacobian_tensor` /
`acquire_mass_matrix_tensor`).

Everything broadcasts over leading batch dims; per-body loops unroll at trace
time (nb <= ~25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as _np

from isaacgymenv_tpu.ops.maths import f32_matmul
from isaacgymenv_tpu.physics import spatial
from isaacgymenv_tpu.physics.kinematics import Kin
from isaacgymenv_tpu.physics.types import JT_FIXED, JT_FREE, SimModel


def _levels(model: SimModel):
    """Bodies grouped by tree depth (static; trace-time only).

    Level-parallel scheduling: all bodies at one depth are independent, so
    their per-body 6D ops batch into one stacked tensor op — on TPU this
    turns 4 quadruped legs' worth of small kernels into 1/4 as many kernels
    of 4x the width (one core executes kernels serially; width is the only
    parallelism).
    """
    depth = [0] * model.nb
    for i in range(model.nb):
        p = model.parent[i]
        depth[i] = 0 if p < 0 else depth[p] + 1
    out = []
    for d in range(max(depth) + 1):
        out.append(tuple(i for i in range(model.nb) if depth[i] == d))
    return out


def _ndof(model: SimModel, i: int) -> int:
    jt = model.jtype[i]
    if jt == JT_FREE:
        return 6
    if jt == JT_FIXED:
        return 0
    return 1


def body_spatial_inertias(model: SimModel, batch_shape, dtype):
    """Per-body 6x6 spatial inertia in the body frame; list of (..., 6, 6)."""
    out = []
    for i in range(model.nb):
        I6 = spatial.spatial_inertia(
            jnp.broadcast_to(model.body_mass[..., i], batch_shape).astype(dtype),
            jnp.broadcast_to(model.body_com[..., i, :], batch_shape + (3,)).astype(dtype),
            jnp.broadcast_to(model.body_inertia[..., i, :, :], batch_shape + (3, 3)).astype(dtype),
        )
        out.append(I6)
    return out


@f32_matmul
def crba(model: SimModel, kin: Kin, inertias: list) -> jnp.ndarray:
    """Composite-rigid-body mass matrix, (..., nv, nv)."""
    batch = kin.p_w[0].shape[:-1]
    dtype = kin.p_w[0].dtype
    nv = model.nv
    Ic = list(inertias)

    # accumulate composite inertias up the tree
    for i in reversed(range(model.nb)):
        par = model.parent[i]
        if par >= 0:
            Ic[par] = Ic[par] + spatial.inertia_to_parent(kin.R_l[i], kin.p_l[i], Ic[i])

    M = jnp.zeros(batch + (nv, nv), dtype)
    for i in range(model.nb):
        ni = _ndof(model, i)
        if ni == 0:
            continue
        vi = model.v_adr[i]
        S_i = kin.S[i]  # (..., 6, ni)
        F = Ic[i] @ S_i  # (..., 6, ni)
        block = jnp.swapaxes(S_i, -1, -2) @ F  # (..., ni, ni)
        M = M.at[..., vi : vi + ni, vi : vi + ni].set(block)
        # walk toward the root, transforming F into ancestor frames
        j = i
        while model.parent[j] >= 0:
            F = jnp.einsum(
                "...ab,...bn->...an", spatial.xform_frc_matrix(kin.R_l[j], kin.p_l[j]), F
            )
            j = model.parent[j]
            nj = _ndof(model, j)
            if nj == 0:
                continue
            vj = model.v_adr[j]
            blk = jnp.swapaxes(F, -1, -2) @ kin.S[j]  # (..., ni, nj)
            M = M.at[..., vi : vi + ni, vj : vj + nj].set(blk)
            M = M.at[..., vj : vj + nj, vi : vi + ni].set(jnp.swapaxes(blk, -1, -2))

    # joint armature on the diagonal (ref: asset dof_props 'armature')
    if model.nd > 0:
        vi = jnp.array(model.dof_v_adr, dtype=jnp.int32)
        arm = jnp.broadcast_to(model.dof_armature, batch + (model.nd,)).astype(dtype)
        M = M.at[..., vi, vi].add(arm)
    return M


@f32_matmul
def rnea_bias(
    model: SimModel,
    kin: Kin,
    inertias: list,
    f_ext_world: jnp.ndarray | None,
) -> jnp.ndarray:
    """Bias force C(q, qd) (..., nv): Coriolis/centrifugal + gravity - external.

    f_ext_world: (..., nb, 6) spatial force [n, f] applied to each body,
    expressed in WORLD axes about the body-frame origin (or None).
    """
    batch = kin.p_w[0].shape[:-1]
    dtype = kin.p_w[0].dtype
    g = model.gravity.astype(dtype)

    # gravity trick: give every root's parent frame acceleration -g
    a_base_world = jnp.concatenate([jnp.zeros_like(g), -g], axis=-1)
    a_base_world = jnp.broadcast_to(a_base_world, batch + (6,))

    a, f = [], []
    for i in range(model.nb):
        par = model.parent[i]
        jt = model.jtype[i]
        va = model.v_adr[i]
        if par < 0:
            a_par = spatial.mot_to_child(kin.R_w[i], kin.p_w[i], a_base_world)
        else:
            a_par = spatial.mot_to_child(kin.R_l[i], kin.p_l[i], a[par])
        # qdd = 0: a_i = a_par + v_i x (S_i qd_i)
        a_i = a_par + spatial.crm(kin.v[i], _joint_velocity(model, kin, i))
        bias = spatial.crf(kin.v[i], jnp.einsum("...ab,...b->...a", inertias[i], kin.v[i]))
        f_i = jnp.einsum("...ab,...b->...a", inertias[i], a_i) + bias
        if f_ext_world is not None:
            # world->body: rotate moment & force, shift to body origin (already about origin)
            fe = f_ext_world[..., i, :]
            n_b = jnp.einsum("...ji,...j->...i", kin.R_w[i], fe[..., :3])
            f_b = jnp.einsum("...ji,...j->...i", kin.R_w[i], fe[..., 3:])
            f_i = f_i - jnp.concatenate([n_b, f_b], axis=-1)
        a.append(a_i)
        f.append(f_i)

    C = jnp.zeros(batch + (model.nv,), dtype)
    for i in reversed(range(model.nb)):
        ni = _ndof(model, i)
        if ni > 0:
            vi = model.v_adr[i]
            tau_i = jnp.einsum("...an,...a->...n", kin.S[i], f[i])
            C = C.at[..., vi : vi + ni].set(tau_i)
        par = model.parent[i]
        if par >= 0:
            f[par] = f[par] + spatial.frc_to_parent(kin.R_l[i], kin.p_l[i], f[i])
    return C


def _joint_velocity(model: SimModel, kin: Kin, i: int) -> jnp.ndarray:
    """S_i * qd_i in the child frame (velocity across joint i)."""
    jt = model.jtype[i]
    par = model.parent[i]
    if par < 0:
        return kin.v[i] if jt == JT_FREE else jnp.zeros_like(kin.v[i])
    v_from_parent = spatial.mot_to_child(kin.R_l[i], kin.p_l[i], kin.v[par])
    return kin.v[i] - v_from_parent


@f32_matmul
def forward_dynamics(
    model: SimModel,
    kin: Kin,
    tau: jnp.ndarray,
    f_ext_world: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """qdd = M^{-1} (tau - C), batched SPD Cholesky solve. tau: (..., nv)."""
    batch = tau.shape[:-1]
    inertias = body_spatial_inertias(model, batch, tau.dtype)
    M = crba(model, kin, inertias)
    C = rnea_bias(model, kin, inertias, f_ext_world)
    rhs = (tau - C)[..., None]
    L = jnp.linalg.cholesky(M)
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    qdd = jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)
    return qdd[..., 0]


@f32_matmul
def mass_matrix(model: SimModel, kin: Kin) -> jnp.ndarray:
    """Public M(q) accessor for OSC controllers (ref: acquire_mass_matrix_tensor)."""
    batch = kin.p_w[0].shape[:-1]
    inertias = body_spatial_inertias(model, batch, kin.p_w[0].dtype)
    return crba(model, kin, inertias)


# ---------------------------------------------------------------------------
# ABA — the hot-path forward dynamics (no matrix assembly, no linalg solve)
# ---------------------------------------------------------------------------


def _solve_sym66(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky solve for SPD (..., 6, 6) systems.

    XLA's batched linalg on TPU is slow for tiny matrices (profiled: 8.8 ms
    for (4096,18,18) vs ~0.1 ms of actual FLOPs); a fully unrolled fixed-size
    factorization lowers to pure VPU elementwise ops and fuses with the rest
    of the substep.
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


@f32_matmul
def aba(
    model: SimModel,
    kin: Kin,
    tau: jnp.ndarray,
    f_ext_world: jnp.ndarray | None = None,
    d_extra: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Articulated-body algorithm: qdd (..., nv).

    tau: (..., nv) generalized applied force.
    f_ext_world: (..., nb, 6) world-frame [moment, force] per body.
    d_extra: (..., nd) additional joint-space diagonal (armature is always
      included; pass the implicit drive/limit stabilization terms here).

    Body-frame spatial algebra identical to rnea_bias/crba; gravity enters
    via the standard accelerating-base trick.
    """
    batch = tau.shape[:-1]
    dtype = tau.dtype
    inertias = body_spatial_inertias(model, batch, dtype)
    nb = model.nb

    # outward: bias accelerations + initial articulated quantities
    c, IA, pA, vJ = [], [], [], []
    for i in range(nb):
        vj = _joint_velocity(model, kin, i)
        vJ.append(vj)
        c.append(spatial.crm(kin.v[i], vj))
        IA.append(inertias[i])
        p_i = spatial.crf(
            kin.v[i], jnp.einsum("...ab,...b->...a", inertias[i], kin.v[i])
        )
        if f_ext_world is not None:
            fe = f_ext_world[..., i, :]
            n_b = jnp.einsum("...ji,...j->...i", kin.R_w[i], fe[..., :3])
            f_b = jnp.einsum("...ji,...j->...i", kin.R_w[i], fe[..., 3:])
            p_i = p_i - jnp.concatenate([n_b, f_b], axis=-1)
        pA.append(p_i)

    # per-dof diagonal additions
    arm = {}
    for d in range(model.nd):
        extra = d_extra[..., d] if d_extra is not None else 0.0
        arm[model.dof_body[d]] = model.dof_armature[..., d] + extra

    U, dinv, u = [None] * nb, [None] * nb, [None] * nb
    # inward: articulated inertia reduction
    for i in reversed(range(nb)):
        jt = model.jtype[i]
        par = model.parent[i]
        if jt in (JT_FIXED,):
            Ia = IA[i]
            pa = pA[i] + jnp.einsum("...ab,...b->...a", IA[i], c[i])
        elif jt == JT_FREE:
            Ia = None  # root; never propagates
            pa = None
        else:  # 1-dof
            S = kin.S[i][..., :, 0]  # (..., 6)
            Ui = jnp.einsum("...ab,...b->...a", IA[i], S)
            di = jnp.einsum("...a,...a->...", S, Ui) + arm[i]
            va = model.v_adr[i]
            ui = tau[..., va] - jnp.einsum("...a,...a->...", S, pA[i])
            U[i], u[i] = Ui, ui
            dinv[i] = 1.0 / di
            Ia = IA[i] - Ui[..., :, None] * Ui[..., None, :] * dinv[i][..., None, None]
            pa = (
                pA[i]
                + jnp.einsum("...ab,...b->...a", Ia, c[i])
                + Ui * (ui * dinv[i])[..., None]
            )
        if par >= 0:
            IA[par] = IA[par] + spatial.inertia_to_parent(kin.R_l[i], kin.p_l[i], Ia)
            pA[par] = pA[par] + spatial.frc_to_parent(kin.R_l[i], kin.p_l[i], pa)

    # outward: accelerations
    g = model.gravity.astype(dtype)
    a_base_world = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros_like(g), -g], axis=-1), batch + (6,)
    )
    qdd = jnp.zeros(batch + (model.nv,), dtype)
    a = [None] * nb
    for i in range(nb):
        jt = model.jtype[i]
        par = model.parent[i]
        if par < 0:
            a_par = spatial.mot_to_child(kin.R_w[i], kin.p_w[i], a_base_world)
        else:
            a_par = spatial.mot_to_child(kin.R_l[i], kin.p_l[i], a[par])
        a_p = a_par + c[i]
        if jt == JT_FREE:
            va = model.v_adr[i]
            tau_root = tau[..., va : va + 6]
            rhs = tau_root - (pA[i] + jnp.einsum("...ab,...b->...a", IA[i], a_p))
            qdd_root = _solve_sym66(IA[i], rhs)
            qdd = qdd.at[..., va : va + 6].set(qdd_root)
            a[i] = a_p + qdd_root
        elif jt == JT_FIXED:
            a[i] = a_p
        else:
            va = model.v_adr[i]
            S = kin.S[i][..., :, 0]
            qdd_i = (u[i] - jnp.einsum("...a,...a->...", U[i], a_p)) * dinv[i]
            qdd = qdd.at[..., va].set(qdd_i)
            a[i] = a_p + S * qdd_i[..., None]
    return qdd


@f32_matmul
def aba_lp(
    model: SimModel,
    kin: Kin,
    tau: jnp.ndarray,
    f_ext_world: jnp.ndarray | None = None,
    d_extra: jnp.ndarray | None = None,
    return_joint_forces: bool = False,
) -> jnp.ndarray:
    """Level-parallel ABA — identical math to `aba`, scheduled by tree DEPTH.

    All bodies at one depth are independent, so their 6D spatial ops run as
    one stacked tensor op over a leading body axis (a quadruped's 4 legs
    become one 4x-wide kernel instead of 4 small ones — the TPU core runs
    kernels serially, so width is the only parallelism).  Verified equal to
    `aba` in tests/test_dynamics.py.

    return_joint_forces: additionally return (..., nb, 6) body-frame [n, f]
    spatial force transmitted through each body's inbound joint
    (f_i = IA_i a_i + pA_i — the force-sensor reading; nearly free since
    IA/pA/a are already in hand).
    """
    batch = tau.shape[:-1]
    dtype = tau.dtype
    nb = model.nb
    levels = _levels(model)

    # ---- stacked per-body arrays, body axis FIRST: (nb, *batch, ...)
    def stk(lst):
        return jnp.stack(lst, axis=0)

    R_l, p_l = stk(kin.R_l), stk(kin.p_l)
    R_w = stk(kin.R_w)
    v = stk(kin.v)
    mass = jnp.moveaxis(jnp.broadcast_to(model.body_mass, batch + (nb,)), -1, 0).astype(dtype)
    com = jnp.moveaxis(jnp.broadcast_to(model.body_com, batch + (nb, 3)), -2, 0).astype(dtype)
    rot_in = jnp.moveaxis(
        jnp.broadcast_to(model.body_inertia, batch + (nb, 3, 3)), -3, 0
    ).astype(dtype)
    I = spatial.spatial_inertia(mass, com, rot_in)  # (nb, *batch, 6, 6)

    # joint velocity vJ per body (kin.v includes vJ; c = v x vJ needs it alone)
    vJ = stk([_joint_velocity_from(model, kin, i, dtype, batch) for i in range(nb)])

    c = spatial.crm(v, vJ)  # (nb, *batch, 6)
    pA = spatial.crf(v, jnp.einsum("n...ab,n...b->n...a", I, v))
    if f_ext_world is not None:
        fe = jnp.moveaxis(f_ext_world, -2, 0).astype(dtype)  # (nb, *batch, 6)
        n_b = jnp.einsum("n...ji,n...j->n...i", R_w, fe[..., :3])
        f_b = jnp.einsum("n...ji,n...j->n...i", R_w, fe[..., 3:])
        pA = pA - jnp.concatenate([n_b, f_b], axis=-1)
    IA = I

    # per-dof diagonal additions (armature + implicit terms)
    arm_by_body = {}
    for d in range(model.nd):
        extra = d_extra[..., d] if d_extra is not None else 0.0
        arm_by_body[model.dof_body[d]] = (
            jnp.broadcast_to(model.dof_armature[..., d], batch).astype(dtype) + extra
        )

    U_s = jnp.zeros((nb,) + batch + (6,), dtype)
    dinv_s = jnp.zeros((nb,) + batch, dtype)
    u_s = jnp.zeros((nb,) + batch, dtype)

    # ---- inward: deepest level first
    for level in reversed(levels[1:]):
        one = _np.array([i for i in level if model.jtype[i] not in (JT_FIXED, JT_FREE)])
        fix = _np.array([i for i in level if model.jtype[i] == JT_FIXED])
        Ia_parts, pa_parts, idx_parts = [], [], []
        if len(one):
            S = stk([kin.S[i][..., :, 0] for i in one])  # (L, *batch, 6)
            arm = stk([arm_by_body[i] for i in one])     # (L, *batch)
            vas = _np.array([model.v_adr[i] for i in one])
            IA_l = IA[one]
            U = jnp.einsum("n...ab,n...b->n...a", IA_l, S)
            d = jnp.einsum("n...a,n...a->n...", S, U) + arm
            tau_l = jnp.moveaxis(tau[..., vas], -1, 0)
            u = tau_l - jnp.einsum("n...a,n...a->n...", S, pA[one])
            dinv = 1.0 / d
            U_s, dinv_s, u_s = U_s.at[one].set(U), dinv_s.at[one].set(dinv), u_s.at[one].set(u)
            Ia = IA_l - U[..., :, None] * U[..., None, :] * dinv[..., None, None]
            pa = (
                pA[one]
                + jnp.einsum("n...ab,n...b->n...a", Ia, c[one])
                + U * (u * dinv)[..., None]
            )
            Ia_parts.append(Ia); pa_parts.append(pa); idx_parts.append(one)
        if len(fix):
            Ia = IA[fix]
            pa = pA[fix] + jnp.einsum("n...ab,n...b->n...a", Ia, c[fix])
            Ia_parts.append(Ia); pa_parts.append(pa); idx_parts.append(fix)
        for Ia, pa, idx in zip(Ia_parts, pa_parts, idx_parts):
            par = _np.array([model.parent[i] for i in idx])
            IA = IA.at[par].add(spatial.inertia_to_parent(R_l[idx], p_l[idx], Ia))
            pA = pA.at[par].add(spatial.frc_to_parent(R_l[idx], p_l[idx], pa))

    # ---- outward: accelerations
    g = model.gravity.astype(dtype)
    a_base_world = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros_like(g), -g], axis=-1), batch + (6,)
    )
    qdd = jnp.zeros(batch + (model.nv,), dtype)
    a = jnp.zeros((nb,) + batch + (6,), dtype)
    for i in levels[0]:  # roots
        a_par = spatial.mot_to_child(kin.R_w[i], kin.p_w[i], a_base_world)
        a_p = a_par + c[i]
        if model.jtype[i] == JT_FREE:
            va = model.v_adr[i]
            rhs = tau[..., va : va + 6] - (
                pA[i] + jnp.einsum("...ab,...b->...a", IA[i], a_p)
            )
            qdd_root = _solve_sym66(IA[i], rhs)
            qdd = qdd.at[..., va : va + 6].set(qdd_root)
            a = a.at[i].set(a_p + qdd_root)
        else:
            a = a.at[i].set(a_p)
    for level in levels[1:]:
        idx = _np.array(level)
        par = _np.array([model.parent[i] for i in idx])
        a_par = spatial.mot_to_child(R_l[idx], p_l[idx], a[par])
        a_p = a_par + c[idx]
        one_mask = _np.array(
            [model.jtype[i] not in (JT_FIXED, JT_FREE) for i in idx]
        )
        if one_mask.any():
            one = idx[one_mask]
            S = stk([kin.S[i][..., :, 0] for i in one])
            a_p1 = a_p[one_mask]
            qdd_i = (
                u_s[one] - jnp.einsum("n...a,n...a->n...", U_s[one], a_p1)
            ) * dinv_s[one]
            vas = _np.array([model.v_adr[i] for i in one])
            qdd = qdd.at[..., vas].set(jnp.moveaxis(qdd_i, 0, -1))
            a_p = a_p.at[one_mask].set(a_p1 + S * qdd_i[..., None])
        a = a.at[idx].set(a_p)
    if return_joint_forces:
        fj = jnp.einsum("n...ab,n...b->n...a", IA, a) + pA
        return qdd, jnp.moveaxis(fj, 0, -2)
    return qdd


def _joint_velocity_from(model: SimModel, kin: Kin, i: int, dtype, batch):
    """vJ of body i (body frame) — mirrors the logic inside kinematics.fk."""
    jt = model.jtype[i]
    if jt == JT_FREE:
        if model.parent[i] < 0:
            return kin.v[i]
        return kin.v[i] - spatial.mot_to_child(
            kin.R_l[i], kin.p_l[i], kin.v[model.parent[i]]
        )
    if jt == JT_FIXED:
        return jnp.zeros(batch + (6,), dtype)
    return _joint_velocity(model, kin, i)
