"""Build-time estimation of per-contact-point effective mass.

The impulse-capped contact model (physics/contact.py) bounds damper and
friction forces by kappa * m_eff * |v| / h.  Using the geom's own body mass
underestimates m_eff badly for light distal links (a 50 g ant foot is backed
by the whole leg), making contacts too slippery; this utility computes the
articulated effective mass 1 / (J M^-1 J^T) at each contact point at a
reference pose, once, on the host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import dynamics, kinematics
from isaacgymenv_tpu.physics.types import SimModel


def attach_effective_masses(model: SimModel, q0: np.ndarray | None = None) -> SimModel:
    """Return model with geom_meff = min-direction effective mass per geom.

    q0: reference generalized positions (defaults to the zero/identity pose).
    """
    if model.ng == 0:
        return model
    if q0 is None:
        from isaacgymenv_tpu.physics.types import make_zero_state

        q = make_zero_state(model, 1).q
    else:
        q = jnp.asarray(q0, jnp.float32)[None]
    qd = jnp.zeros((1, model.nv))
    kin = kinematics.fk(model, q, qd)
    inertias = dynamics.body_spatial_inertias(model, (1,), jnp.float32)
    M = dynamics.crba(model, kin, inertias)[0]
    Minv = jnp.linalg.inv(M + 1e-9 * jnp.eye(model.nv))

    meff, meff_el = [], []
    for g in range(model.ng):
        b = model.geom_body[g]
        point_w = kin.p_w[b][0] + maths.quat_rotate(
            maths.rotmat_to_quat(kin.R_w[b][0]), model.geom_offset[g]
        )
        J = kinematics.body_jacobian(model, kin, b, point_w[None])[0]  # (6, nv)
        J_lin = J[0:3]
        lam = J_lin @ Minv @ J_lin.T  # inverse effective mass matrix (3,3)
        diag = jnp.diagonal(lam)
        m_dir = 1.0 / jnp.maximum(diag, 1e-6)  # per-axis effective mass
        meff.append(float(jnp.clip(jnp.min(m_dir), 1e-3, 1e4)))
        meff_el.append(float(jnp.clip(jnp.max(m_dir), 1e-3, 1e4)))
    # NOTE: no static per-geom split here.  Contact multiplicity is handled
    # DYNAMICALLY at sim time: each contact's effective-mass budget is
    # divided by its body's live active-contact count
    # (contact.body_active_counts), so the SUM of stiffness/impulse caps
    # across simultaneous contacts stays exactly within the stability bound
    # while single-contact cases (locomotion feet) keep full stiction.
    model = model.replace(
        geom_meff=jnp.array(meff, jnp.float32),
        geom_meff_el=jnp.array(meff_el, jnp.float32),
    )

    # surface-side effective masses for body-vs-body pair contacts: the
    # articulated effective mass at the surface center (same derivation)
    if model.surf_body:
        smeff, smeff_el = [], []
        for s in range(len(model.surf_body)):
            b = model.surf_body[s]
            point_w = kin.p_w[b][0] + jnp.einsum(
                "ij,j->i", kin.R_w[b][0], model.surf_offset[s]
            )
            J = kinematics.body_jacobian(model, kin, b, point_w[None])[0]
            lam = J[0:3] @ Minv @ J[0:3].T
            m_dir = 1.0 / jnp.maximum(jnp.diagonal(lam), 1e-6)
            smeff.append(float(jnp.clip(jnp.min(m_dir), 1e-3, 1e4)))
            smeff_el.append(float(jnp.clip(jnp.max(m_dir), 1e-3, 1e4)))
        model = model.replace(
            surf_meff=jnp.array(smeff, jnp.float32),
            surf_meff_el=jnp.array(smeff_el, jnp.float32),
        )

    # SDF-side effective masses (at the body origin; SDF colliders are
    # whole-body meshes, the origin is the best single-point estimate)
    if model.sdf_body:
        fmeff, fmeff_el = [], []
        for b in model.sdf_body:
            J = kinematics.body_jacobian(model, kin, b, kin.p_w[b][0][None])[0]
            lam = J[0:3] @ Minv @ J[0:3].T
            m_dir = 1.0 / jnp.maximum(jnp.diagonal(lam), 1e-6)
            fmeff.append(float(jnp.clip(jnp.min(m_dir), 1e-3, 1e4)))
            fmeff_el.append(float(jnp.clip(jnp.max(m_dir), 1e-3, 1e4)))
        model = model.replace(
            sdf_meff=jnp.array(fmeff, jnp.float32),
            sdf_meff_el=jnp.array(fmeff_el, jnp.float32),
        )
    return model
