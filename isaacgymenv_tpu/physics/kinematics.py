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

from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import spatial
from isaacgymenv_tpu.physics.types import (
    JT_FIXED,
    JT_FREE,
    JT_PRISMATIC,
    JT_REVOLUTE,
    SimModel,
)


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
    return None


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
        elif jt in (JT_REVOLUTE, JT_PRISMATIC):
            vj = S[..., :, 0] * qd[..., va : va + 1]
        else:
            vj = jnp.zeros(batch + (6,), dtype)
        if par < 0:
            v = vj
        else:
            v = spatial.mot_to_child(R, p, v_all[par]) + vj
        v_all.append(v)
    return Kin(R_l=R_l, p_l=p_l, R_w=R_w, p_w=p_w, S=S_all, v=v_all)


def world_velocities(model: SimModel, kin: Kin):
    """World-frame (angvel, linvel-of-origin) per body: lists of (..., 3)."""
    ang, lin = [], []
    for i in range(model.nb):
        w = jnp.einsum("...ij,...j->...i", kin.R_w[i], kin.v[i][..., :3])
        v = jnp.einsum("...ij,...j->...i", kin.R_w[i], kin.v[i][..., 3:])
        ang.append(w)
        lin.append(v)
    return ang, lin


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
        if jt == JT_REVOLUTE or jt == JT_PRISMATIC:
            axis_w = jnp.einsum("...ij,...j->...i", kin.R_w[i], model.joint_axis[..., i, :])
            if jt == JT_REVOLUTE:
                lever = point_w - kin.p_w[i]
                lin = jnp.cross(axis_w, lever)
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
