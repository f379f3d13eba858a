"""Featherstone 6D spatial algebra, batched and jit/vmap-safe.

Conventions
-----------
- Spatial motion vector: ``[omega(3), v(3)]`` (angular first).
- Spatial force vector:  ``[n(3), f(3)]`` (moment first).
- A frame transform is a pair ``(R, p)``: rotation matrix ``R`` (child axes
  expressed in parent coordinates) and origin ``p`` of the child frame in
  parent coordinates.  All ops broadcast over leading batch dims.

This is the math layer under the articulated dynamics in
``physics/dynamics.py`` (TPU-native replacement of the reference's PhysX GPU
pipeline — see SURVEY.md §2.1).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# motion / force coordinate transforms
# ---------------------------------------------------------------------------


def mot_to_parent(R: jnp.ndarray, p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Motion vector expressed in child frame -> parent frame."""
    w = jnp.einsum("...ij,...j->...i", R, m[..., :3])
    v = jnp.einsum("...ij,...j->...i", R, m[..., 3:]) + jnp.cross(p, w)
    return jnp.concatenate([w, v], axis=-1)


def mot_to_child(R: jnp.ndarray, p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Motion vector expressed in parent frame -> child frame."""
    w_p, v_p = m[..., :3], m[..., 3:]
    w = jnp.einsum("...ji,...j->...i", R, w_p)
    v = jnp.einsum("...ji,...j->...i", R, v_p - jnp.cross(p, w_p))
    return jnp.concatenate([w, v], axis=-1)


def frc_to_parent(R: jnp.ndarray, p: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Force vector expressed in child frame -> parent frame."""
    lin = jnp.einsum("...ij,...j->...i", R, f[..., 3:])
    n = jnp.einsum("...ij,...j->...i", R, f[..., :3]) + jnp.cross(p, lin)
    return jnp.concatenate([n, lin], axis=-1)


def frc_to_child(R: jnp.ndarray, p: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Force vector expressed in parent frame -> child frame."""
    n_p, lin_p = f[..., :3], f[..., 3:]
    lin = jnp.einsum("...ji,...j->...i", R, lin_p)
    n = jnp.einsum("...ji,...j->...i", R, n_p - jnp.cross(p, lin_p))
    return jnp.concatenate([n, lin], axis=-1)


# ---------------------------------------------------------------------------
# spatial cross products
# ---------------------------------------------------------------------------


def crm(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product  v x m  (both motion vectors)."""
    w, vl = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vl, mw)], axis=-1
    )


def crf(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product  v x* f  (motion x force)."""
    w, vl = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


# ---------------------------------------------------------------------------
# spatial inertia (6x6 about body-frame origin)
# ---------------------------------------------------------------------------


def spatial_inertia(mass: jnp.ndarray, com: jnp.ndarray, inertia_com: jnp.ndarray) -> jnp.ndarray:
    """Build the 6x6 spatial inertia about the body frame origin.

    mass: (...,), com: (..., 3) body-frame COM offset,
    inertia_com: (..., 3, 3) rotational inertia about the COM.

    I = [[ Ic + m cx cx^T,  m cx ],
         [ m cx^T,          m 1  ]]
    """
    cx = skew(com)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=com.dtype), cx.shape)
    top_left = inertia_com + m * cx @ jnp.swapaxes(cx, -1, -2)
    top_right = m * cx
    bot_left = m * jnp.swapaxes(cx, -1, -2)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def xform_mot_matrix(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """6x6 motion transform child->parent:  [[R, 0], [px R, R]]."""
    px = skew(p)
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, zero], axis=-1)
    bot = jnp.concatenate([px @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def xform_frc_matrix(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """6x6 force transform child->parent:  [[R, px R], [0, R]]."""
    px = skew(p)
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, px @ R], axis=-1)
    bot = jnp.concatenate([zero, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_to_parent(R: jnp.ndarray, p: jnp.ndarray, I_child: jnp.ndarray) -> jnp.ndarray:
    """Transform a 6x6 spatial inertia from child frame to parent frame.

    I_parent = Xf * I_child * Xm^{-1}  with Xm^{-1} = motion parent->child.
    Using Xm(p->c) = Xm(c->p)^{-1}; numerically:  Xf(c->p) I Xm(c->p)^T is
    NOT correct in general — but for our (R, p) rigid transforms
    Xm(c->p)^{-1} = Xm_inv and Xf(c->p) = Xm(c->p)^{-T}, so
    I_parent = Xm^{-T} I Xm^{-1} where Xm = motion transform parent->child.
    Equivalently with A = xform_mot_matrix(R, p) (child->parent):
    I_parent = A^{-T}... — we avoid inverses: force-transform both sides:
    I_parent = Xf(c->p) @ I_child @ Xm(p->c) with Xm(p->c) explicit below.
    """
    Rt = jnp.swapaxes(R, -1, -2)
    px = skew(p)
    zero = jnp.zeros_like(R)
    # motion transform parent->child: [[R^T, 0], [-R^T px, R^T]]
    top = jnp.concatenate([Rt, zero], axis=-1)
    bot = jnp.concatenate([-Rt @ px, Rt], axis=-1)
    xm_p2c = jnp.concatenate([top, bot], axis=-2)
    xf_c2p = xform_frc_matrix(R, p)
    return xf_c2p @ I_child @ xm_p2c
