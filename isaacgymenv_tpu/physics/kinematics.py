"""Batched forward kinematics + Jacobians over the static kinematic forest.

All functions take the batched state arrays `q (..., nq)` / `qd (..., nv)`
and loop over bodies at *trace* time (topology is static) — XLA sees a flat
fused graph of `(N, ...)` tensor ops, the TPU-native analog of PhysX's
articulation kernels (SURVEY.md §2.1).

Frames: per-body local transform ``(R_l, p_l)`` = child frame in parent
frame; world transform ``(R_w, p_w)`` = body frame in env-local world frame.
Spatial velocities follow physics/spatial.py: ``[omega, v]`` body-frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as _np

from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import spatial
from isaacgymenv_tpu.physics.types import (
    JT_FIXED,
    JT_FREE,
    JT_PRISMATIC,
    JT_REVOLUTE,
    JT_SCREW,
    SimModel,
)

_TWO_PI = 6.283185307179586


def _rot_about_axis(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation matrix about a (broadcastable) unit axis.

    axis: (..., 3), angle: (...,) -> (..., 3, 3).
    """
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    ax = spatial.skew(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), ax.shape)
    outer = axis[..., :, None] * axis[..., None, :]
    return c * eye + s * ax + (1.0 - c) * outer


class Kin(NamedTuple):
    """Per-body kinematic quantities; each entry is a list of length nb."""

    R_l: list  # (..., 3, 3) child-in-parent rotation
    p_l: list  # (..., 3)   child origin in parent frame
    R_w: list  # (..., 3, 3) body-in-world rotation
    p_w: list  # (..., 3)   body origin in world
    S: list    # (..., 6, ni) joint motion subspace in child frame (None if 0-dof)
    v: list    # (..., 6)   body-frame spatial velocity


def joint_local_transform(model: SimModel, q: jnp.ndarray, i: int):
    """(R_l, p_l) of body i in its parent's frame, given batched q."""
    qa = model.q_adr[i]
    jt = model.jtype[i]
    R_tree = maths.quat_to_rotmat(model.joint_quat[..., i, :])
    p_tree = model.joint_pos[..., i, :]
    if jt == JT_FREE:
        quat = q[..., qa + 3 : qa + 7]
        pos = q[..., qa : qa + 3]
        R_j = maths.quat_to_rotmat(quat)
        R = R_tree @ R_j
        p = p_tree + jnp.einsum("...ij,...j->...i", R_tree, pos)
    elif jt == JT_REVOLUTE:
        axis = model.joint_axis[..., i, :]
        R_j = _rot_about_axis(axis, q[..., qa])
        R = R_tree @ R_j
        p = jnp.broadcast_to(p_tree, q.shape[:-1] + (3,))
    elif jt == JT_PRISMATIC:
        axis = model.joint_axis[..., i, :]
        R = jnp.broadcast_to(R_tree, q.shape[:-1] + (3, 3))
        p = p_tree + jnp.einsum(
            "...ij,...j->...i", R_tree, axis * q[..., qa : qa + 1]
        )
    elif jt == JT_SCREW:
        axis = model.joint_axis[..., i, :]
        R_j = _rot_about_axis(axis, q[..., qa])
        R = R_tree @ R_j
        lead = model.joint_pitch[i] / _TWO_PI
        p = p_tree + jnp.einsum(
            "...ij,...j->...i", R_tree, axis * (lead * q[..., qa : qa + 1])
        )
    else:  # JT_FIXED
        R = jnp.broadcast_to(R_tree, q.shape[:-1] + (3, 3))
        p = jnp.broadcast_to(p_tree, q.shape[:-1] + (3,))
    return R, p


def joint_subspace(model: SimModel, i: int, batch_shape, dtype):
    """Motion subspace S (..., 6, ni) in the child frame; None for 0-dof."""
    jt = model.jtype[i]
    if jt == JT_FREE:
        S = jnp.broadcast_to(jnp.eye(6, dtype=dtype), batch_shape + (6, 6))
        return S
    if jt in (JT_REVOLUTE, JT_PRISMATIC):
        axis = jnp.broadcast_to(model.joint_axis[..., i, :], batch_shape + (3,))
        zero = jnp.zeros_like(axis)
        col = jnp.concatenate([axis, zero], -1) if jt == JT_REVOLUTE else jnp.concatenate([zero, axis], -1)
        return col[..., :, None]
    if jt == JT_SCREW:
        axis = jnp.broadcast_to(model.joint_axis[..., i, :], batch_shape + (3,))
        col = jnp.concatenate([axis, axis * (model.joint_pitch[i] / _TWO_PI)], -1)
        return col[..., :, None]
    return None


@maths.f32_matmul
def fk(model: SimModel, q: jnp.ndarray, qd: jnp.ndarray) -> Kin:
    """Forward kinematics + velocities for all bodies."""
    batch = q.shape[:-1]
    dtype = q.dtype
    R_l, p_l, R_w, p_w, S_all, v_all = [], [], [], [], [], []
    for i in range(model.nb):
        R, p = joint_local_transform(model, q, i)
        R_l.append(R)
        p_l.append(p)
        par = model.parent[i]
        if par < 0:
            R_w.append(R)
            p_w.append(p)
        else:
            R_w.append(R_w[par] @ R)
            p_w.append(p_w[par] + jnp.einsum("...ij,...j->...i", R_w[par], p))

        S = joint_subspace(model, i, batch, dtype)
        S_all.append(S)
        va = model.v_adr[i]
        jt = model.jtype[i]
        if jt == JT_FREE:
            vj = qd[..., va : va + 6]
        elif jt in (JT_REVOLUTE, JT_PRISMATIC, JT_SCREW):
            vj = S[..., :, 0] * qd[..., va : va + 1]
        else:
            vj = jnp.zeros(batch + (6,), dtype)
        if par < 0:
            v = vj
        else:
            v = spatial.mot_to_child(R, p, v_all[par]) + vj
        v_all.append(v)
    return Kin(R_l=R_l, p_l=p_l, R_w=R_w, p_w=p_w, S=S_all, v=v_all)


def _fk_levels(model: SimModel):
    """Bodies grouped by tree depth (static; trace-time only)."""
    depth = [0] * model.nb
    for i in range(model.nb):
        p = model.parent[i]
        depth[i] = 0 if p < 0 else depth[p] + 1
    return [
        tuple(i for i in range(model.nb) if depth[i] == d)
        for d in range(max(depth) + 1)
    ]


@maths.f32_matmul
def fk_lp(model: SimModel, q: jnp.ndarray, qd: jnp.ndarray) -> Kin:
    """Level-parallel FK — identical math to `fk`, scheduled by tree DEPTH.

    Local joint transforms are computed in one stacked op per *joint type*
    (all revolute joints of a quadruped's 4 legs become one wide Rodrigues
    kernel), and world transforms propagate level-by-level with stacked
    gathers + matmuls.  The TPU core runs kernels serially, so fewer/wider
    kernels is the only way to cut per-step launch + padding overhead.
    Verified equal to `fk` in tests/test_dynamics.py.

    NOT used by the engine: measured 0.73x on Anymal (scripts/bench_aba_lp.py)
    — the level-by-level `.at[idx].set` world-propagation scatters rewrite
    the full (nb, N, ...) arrays each level, which costs more HBM traffic
    than the serial fk's small per-body ops save in launches.  `aba_lp`
    avoids this (+19%) because its scatters replace far more work (the 6x6
    articulated-inertia chain).  Kept as a tested reference schedule.
    """
    batch = q.shape[:-1]
    dtype = q.dtype
    nb = model.nb
    levels = _fk_levels(model)

    free = _np.array([i for i in range(nb) if model.jtype[i] == JT_FREE])
    rev = _np.array([i for i in range(nb) if model.jtype[i] == JT_REVOLUTE])
    pri = _np.array([i for i in range(nb) if model.jtype[i] == JT_PRISMATIC])
    scr = _np.array([i for i in range(nb) if model.jtype[i] == JT_SCREW])

    def bstk(x, trailing):
        """model array (..., nb, *trailing) -> (nb, *batch, *trailing)."""
        x = jnp.broadcast_to(x, batch + (nb,) + trailing).astype(dtype)
        return jnp.moveaxis(x, -1 - len(trailing), 0)

    R_tree = bstk(maths.quat_to_rotmat(model.joint_quat), (3, 3))
    p_tree = bstk(model.joint_pos, (3,))
    axis_s = bstk(model.joint_axis, (3,))

    # ---- local transforms (covers FIXED by default; overwrite per type)
    R_l = R_tree
    p_l = p_tree
    vJ = jnp.zeros((nb,) + batch + (6,), dtype)

    if len(rev):
        qa = _np.array([model.q_adr[i] for i in rev])
        va = _np.array([model.v_adr[i] for i in rev])
        ang = jnp.moveaxis(q[..., qa], -1, 0)  # (nr, *batch)
        R_j = _rot_about_axis(axis_s[rev], ang)
        R_l = R_l.at[rev].set(R_tree[rev] @ R_j)
        w = axis_s[rev] * jnp.moveaxis(qd[..., va], -1, 0)[..., None]
        vJ = vJ.at[rev, ..., :3].set(w)
    if len(pri):
        qa = _np.array([model.q_adr[i] for i in pri])
        va = _np.array([model.v_adr[i] for i in pri])
        disp = jnp.moveaxis(q[..., qa], -1, 0)[..., None]  # (np, *batch, 1)
        p_l = p_l.at[pri].set(
            p_tree[pri]
            + jnp.einsum("n...ij,n...j->n...i", R_tree[pri], axis_s[pri] * disp)
        )
        vel = axis_s[pri] * jnp.moveaxis(qd[..., va], -1, 0)[..., None]
        vJ = vJ.at[pri, ..., 3:].set(vel)
    if len(scr):
        qa = _np.array([model.q_adr[i] for i in scr])
        va = _np.array([model.v_adr[i] for i in scr])
        lead = jnp.array(
            [model.joint_pitch[i] / _TWO_PI for i in scr], dtype
        ).reshape((len(scr),) + (1,) * len(batch))
        ang = jnp.moveaxis(q[..., qa], -1, 0)  # (ns, *batch)
        R_j = _rot_about_axis(axis_s[scr], ang)
        R_l = R_l.at[scr].set(R_tree[scr] @ R_j)
        p_l = p_l.at[scr].set(
            p_tree[scr]
            + jnp.einsum(
                "n...ij,n...j->n...i",
                R_tree[scr],
                axis_s[scr] * (lead * ang)[..., None],
            )
        )
        qds = jnp.moveaxis(qd[..., va], -1, 0)[..., None]
        vJ = vJ.at[scr, ..., :3].set(axis_s[scr] * qds)
        vJ = vJ.at[scr, ..., 3:].set(axis_s[scr] * (lead[..., None] * qds))
    if len(free):
        qa = _np.array([model.q_adr[i] for i in free])
        va = _np.array([model.v_adr[i] for i in free])
        pos_idx = qa[:, None] + _np.arange(3)
        quat_idx = qa[:, None] + 3 + _np.arange(4)
        vel_idx = va[:, None] + _np.arange(6)
        pos = jnp.moveaxis(q[..., pos_idx], -2, 0)   # (nf, *batch, 3)
        quat = jnp.moveaxis(q[..., quat_idx], -2, 0)
        R_j = maths.quat_to_rotmat(quat)
        R_l = R_l.at[free].set(R_tree[free] @ R_j)
        p_l = p_l.at[free].set(
            p_tree[free] + jnp.einsum("n...ij,n...j->n...i", R_tree[free], pos)
        )
        vJ = vJ.at[free].set(jnp.moveaxis(qd[..., vel_idx], -2, 0))

    # ---- world propagation, level by level (roots are already correct:
    # deeper entries are overwritten before any read targets them)
    R_w = R_l
    p_w = p_l
    v = vJ
    for level in levels[1:]:
        idx = _np.array(level)
        par = _np.array([model.parent[i] for i in idx])
        Rp = R_w[par]
        R_w = R_w.at[idx].set(Rp @ R_l[idx])
        p_w = p_w.at[idx].set(
            p_w[par] + jnp.einsum("n...ij,n...j->n...i", Rp, p_l[idx])
        )
        v = v.at[idx].set(
            spatial.mot_to_child(R_l[idx], p_l[idx], v[par]) + vJ[idx]
        )

    S_all = [joint_subspace(model, i, batch, dtype) for i in range(nb)]
    return Kin(
        R_l=[R_l[i] for i in range(nb)],
        p_l=[p_l[i] for i in range(nb)],
        R_w=[R_w[i] for i in range(nb)],
        p_w=[p_w[i] for i in range(nb)],
        S=S_all,
        v=[v[i] for i in range(nb)],
    )


def world_velocities(model: SimModel, kin: Kin):
    """World-frame (angvel, linvel-of-origin) per body: lists of (..., 3)."""
    ang, lin = [], []
    for i in range(model.nb):
        w = jnp.einsum("...ij,...j->...i", kin.R_w[i], kin.v[i][..., :3])
        v = jnp.einsum("...ij,...j->...i", kin.R_w[i], kin.v[i][..., 3:])
        ang.append(w)
        lin.append(v)
    return ang, lin


@maths.f32_matmul
def body_jacobian(model: SimModel, kin: Kin, body: int, point_w: jnp.ndarray) -> jnp.ndarray:
    """World-frame 6xnv Jacobian of a point on `body`.

    Rows [0:3] linear, [3:6] angular (matching Isaac's jacobian tensor layout,
    ref: tasks/useful_hound.py:448-455).  point_w: (..., 3) world point.
    Returns (..., 6, nv).
    """
    batch = point_w.shape[:-1]
    nv = model.nv
    J = jnp.zeros(batch + (6, nv), point_w.dtype)
    i = body
    while i >= 0:
        jt = model.jtype[i]
        va = model.v_adr[i]
        if jt in (JT_REVOLUTE, JT_PRISMATIC, JT_SCREW):
            axis_w = jnp.einsum("...ij,...j->...i", kin.R_w[i], model.joint_axis[..., i, :])
            if jt == JT_REVOLUTE:
                lever = point_w - kin.p_w[i]
                lin = jnp.cross(axis_w, lever)
                ang = axis_w
            elif jt == JT_SCREW:
                lever = point_w - kin.p_w[i]
                lin = jnp.cross(axis_w, lever) + axis_w * (model.joint_pitch[i] / _TWO_PI)
                ang = axis_w
            else:
                lin = axis_w
                ang = jnp.zeros_like(axis_w)
            J = J.at[..., 0:3, va].set(lin)
            J = J.at[..., 3:6, va].set(ang)
        elif jt == JT_FREE:
            # columns for [omega_b(3), v_b(3)]: world effect of body-frame root vel
            R = kin.R_w[i]
            lever = point_w - kin.p_w[i]
            for k in range(3):
                wk = R[..., :, k]  # world direction of body axis k
                J = J.at[..., 0:3, va + k].set(jnp.cross(wk, lever))
                J = J.at[..., 3:6, va + k].set(wk)
                J = J.at[..., 0:3, va + 3 + k].set(wk)
        i = model.parent[i]
    return J
