"""Soft (penalty) contact between body-attached spheres and a heightfield.

TPU-native replacement of PhysX's iterative TGS contact solver (SURVEY.md
§7 "hard parts" #1): contacts are compliant spring-dampers with a Coulomb
friction cone, evaluated in closed form per substep — no data-dependent
iteration, fully fused by XLA across the env batch.

The ground is always a heightfield; a flat plane is `terrain=None`
(constant height 0), matching the reference where the trimesh terrain is
itself generated from a heightfield (ref: tasks/anymal_terrain.py:576).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


import functools


@functools.lru_cache(maxsize=None)
def _scatter_matrix_np(idx: tuple, n_out: int):
    import numpy as _np

    M = _np.zeros((len(idx), n_out), _np.float32)
    M[_np.arange(len(idx)), list(idx)] = 1.0
    return M


def _scatter_matrix(idx: tuple, n_out: int) -> jnp.ndarray:
    """Static one-hot (len(idx), n_out) scatter matrix.

    TPU-native replacement for `.at[..., idx, :].add(...)` accumulation:
    XLA lowers scatter-add to a serialized loop on TPU, while the
    equivalent einsum contraction rides the MXU (fp32 under the physics
    precision scope).  idx is trace-time-static (model topology).  The
    cached value is the HOST array — converting per call keeps each jit
    trace's constant inside its own scope (a cached device array created
    under one trace leaks a tracer into the next)."""
    return jnp.asarray(_scatter_matrix_np(idx, n_out))


@struct.dataclass
class Heightfield:
    """Env-shared terrain grid (host-generated, ref: anymal_terrain.py:543)."""

    heights: jnp.ndarray  # (H, W) heights in meters (row = x, col = y)
    hscale: float = struct.field(pytree_node=False)   # meters per cell
    border_x: float = struct.field(pytree_node=False)  # world x of grid row 0
    border_y: float = struct.field(pytree_node=False)  # world y of grid col 0


def height_at(terrain: Optional[Heightfield], x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Terrain height under world (x, y).

    Replicates the reference's two-corner-min lookup exactly
    (ref: tasks/anymal_terrain.py:515-538 `get_heights` — min of the cell
    corner and its +1,+1 diagonal, NOT true bilinear; SURVEY.md §"quirks").
    """
    if terrain is None:
        return jnp.zeros_like(x)
    H, W = terrain.heights.shape
    px = (x - terrain.border_x) / terrain.hscale
    py = (y - terrain.border_y) / terrain.hscale
    ix = jnp.clip(px.astype(jnp.int32), 0, H - 2)
    iy = jnp.clip(py.astype(jnp.int32), 0, W - 2)
    h1 = terrain.heights[ix, iy]
    h2 = terrain.heights[ix + 1, iy + 1]
    return jnp.minimum(h1, h2)


def terrain_normal(
    terrain: Optional[Heightfield], x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Approximate surface normal by central differences of the height lookup."""
    if terrain is None:
        n = jnp.zeros(x.shape + (3,), x.dtype)
        return n.at[..., 2].set(1.0)
    eps = terrain.hscale
    dhdx = (height_at(terrain, x + eps, y) - height_at(terrain, x - eps, y)) / (2 * eps)
    dhdy = (height_at(terrain, x, y + eps) - height_at(terrain, x, y - eps)) / (2 * eps)
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(x)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def ground_active(model, terrain, geom_pos_w) -> jnp.ndarray:
    """(..., ng) bool: geoms currently penetrating the ground/heightfield."""
    x, y, z = geom_pos_w[..., 0], geom_pos_w[..., 1], geom_pos_w[..., 2]
    hgt = height_at(terrain, x, y)
    return (hgt + model.geom_radius - z) > 0.0


def pair_active(model, geom_pos_w, body_pos_w, body_R_w) -> Optional[jnp.ndarray]:
    """(..., np) bool: pair contacts currently penetrating."""
    if not model.n_pairs:
        return None
    pg = jnp.array(model.pair_geom, jnp.int32)
    ps = np.array(model.pair_surf)
    sb = jnp.array([model.surf_body[s] for s in model.pair_surf], jnp.int32)
    kind = jnp.array([model.surf_kind[s] for s in model.pair_surf], jnp.int32)
    c = geom_pos_w[..., pg, :]
    Rb = body_R_w[..., sb, :, :]
    R_s = Rb @ model.surf_rotm[ps]
    p_s = body_pos_w[..., sb, :] + jnp.einsum(
        "...nij,...nj->...ni", Rb,
        jnp.broadcast_to(model.surf_offset[..., ps, :], c.shape),
    )
    local = jnp.einsum("...nji,...nj->...ni", R_s, c - p_s)
    _, d_surf = _surface_closest(kind, local, size=model.surf_size[..., ps, :])
    return (model.geom_radius[..., pg] - d_surf) > 0.0


def body_active_counts(model, act_g, act_p, batch_shape, act_sdf=None) -> jnp.ndarray:
    """(..., nb) number of currently-active contacts loading each body.

    The per-contact stiffness/impulse caps are m_eff/h^2- and m_eff/h-shaped;
    dividing each contact's effective mass by the body's LIVE active count
    keeps the SUM across simultaneous contacts exactly within the stability
    budget while leaving single-contact cases (locomotion feet) at full
    stiction.  (A static split starved friction whenever fewer contacts
    were active than the worst case.)"""
    nb = model.nb
    counts = jnp.zeros(batch_shape + (nb,), jnp.float32)
    Mg0 = _scatter_matrix(tuple(int(b) for b in model.geom_body), nb)
    counts = counts + jnp.einsum("...g,gb->...b", act_g.astype(jnp.float32), Mg0)
    if act_p is not None:
        Mpg = _scatter_matrix(
            tuple(int(model.geom_body[g]) for g in model.pair_geom), nb
        )
        Mps = _scatter_matrix(
            tuple(int(model.surf_body[s]) for s in model.pair_surf), nb
        )
        ap = act_p.astype(jnp.float32)
        counts = counts + jnp.einsum("...p,pb->...b", ap, Mpg + Mps)
    if act_sdf is not None:
        for k, a in enumerate(act_sdf):
            if a is None:
                continue
            fgb = jnp.array(
                [model.geom_body[g] for g in model.sdf_pair_geom[k]], jnp.int32
            )
            af = a.astype(jnp.float32)
            counts = counts.at[..., fgb].add(af)
            counts = counts.at[..., model.sdf_body[k]].add(jnp.sum(af, axis=-1))
    return jnp.maximum(counts, 1.0)


def stiction_force(slip, v_t, n, fn, mu, kt_el, ct, h, active):
    """Anchored-spring stiction with Coulomb-cone projection.

    slip is the tangential spring displacement state (..., k, 3).  Advance
    it by the slip velocity, evaluate the spring-damper force, clamp to the
    friction cone; while clamped the anchor slides so the SPRING alone sits
    exactly at the cone boundary (elastoplastic bristle update).  A loaded
    contact in stick carries any force <= mu*fn with ZERO steady-state creep
    — the behavior PhysX gets from TGS position iterations, which a
    viscous-only penalty law cannot reproduce (force ∝ slip velocity means
    stance feet must skate to generate traction).

    Returns (f_t (..., k, 3), slip_new (..., k, 3)).
    """
    s = slip + v_t * h
    # keep the spring tangential as the contact normal evolves
    s = s - jnp.sum(s * n, axis=-1, keepdims=True) * n
    f_trial = -kt_el[..., None] * s - ct[..., None] * v_t
    f_mag = jnp.linalg.norm(f_trial, axis=-1)
    f_max = mu * fn
    clamp = f_mag > f_max
    scale = jnp.where(clamp, f_max / jnp.maximum(f_mag, 1e-9), 1.0)
    f_t = f_trial * scale[..., None]
    # slide the anchor: spring stretch consistent with the clamped force
    s_new = jnp.where(
        clamp[..., None],
        -f_t / jnp.maximum(kt_el, 1e-9)[..., None],
        s,
    )
    s_new = jnp.where(active[..., None], s_new, 0.0)
    f_t = jnp.where(active[..., None], f_t, 0.0)
    return f_t, s_new


def contact_forces(
    model,
    terrain: Optional[Heightfield],
    geom_pos_w: jnp.ndarray,   # (..., ng, 3) world positions of contact spheres
    geom_vel_w: jnp.ndarray,   # (..., ng, 3) world velocities of sphere centers
    body_pos_w: jnp.ndarray,   # (..., nb, 3) body origins (for torque levers)
    h: float = 1e-2,           # substep size (for impulse-capped damping)
    n_active: Optional[jnp.ndarray] = None,  # (..., nb) live contact counts
    slip: Optional[jnp.ndarray] = None,      # (..., ng, 3) stiction state
    geom_ang_w: Optional[jnp.ndarray] = None,  # (..., ng, 3) body angular vel
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute per-body external spatial forces from ground contact.

    Returns:
      f_ext_world: (..., nb, 6) spatial [moment, force] per body about the
                   body origin, world axes — feeds `dynamics.rnea_bias`.
      body_contact_force: (..., nb, 3) net world contact force per body —
                   the `net_contact_force_tensor` equivalent used by
                   termination logic (ref: tasks/anymal.py:331-337).
      slip_new: (..., ng, 3) advanced stiction state.
    """
    x, y, z = geom_pos_w[..., 0], geom_pos_w[..., 1], geom_pos_w[..., 2]
    hgt = height_at(terrain, x, y)
    n = terrain_normal(terrain, x, y)  # (..., ng, 3)

    radius = model.geom_radius
    depth = hgt + radius - z  # penetration along +z (sphere bottom below surface)
    active = depth > 0.0

    kn = model.contact_stiffness
    kd = model.contact_damping
    kt = model.tangential_stiffness

    v = geom_vel_w
    if geom_ang_w is not None:
        # material velocity at the contact point (sphere bottom): rolling
        # spheres have zero slip there, so stiction doesn't resist rolling
        v = v + jnp.cross(geom_ang_w, -radius[..., None] * n)
    v_n = jnp.sum(v * n, axis=-1)
    v_t = v - v_n[..., None] * n
    vt_norm = jnp.linalg.norm(v_t, axis=-1)

    # Hunt-Crossley-style normal force: damping scales with depth, so the
    # force is continuous at touchdown (no impulsive damper => no contact
    # chatter under explicit integration at light end-effector masses).
    # Depth is clamped so spawn-time penetration produces a bounded push-out
    # (the max_depenetration_velocity analog, ref: cfg sim.physx).
    #
    # Both the normal damper and the tangential friction force are capped by
    # the momentum-arrest impulse kappa*m_body*|v|/h — an explicit damper can
    # never remove more than a fraction of the body's momentum in one
    # substep, which makes the scheme unconditionally stable for arbitrarily
    # light bodies (nv_ant feet are 50 g) with NO per-task damping tuning.
    # Damping caps (impulse budgets per substep, as a fraction kappa of
    # the momentum an explicit damper may remove):
    # - NORMAL: kappa_n = 1.0 — the DEADBEAT limit c = m/h (stable; c<2m/h
    #   oscillates only above it).  The old 0.25 cap allowed zeta ~ 0.125,
    #   i.e. restitution ~ 0.8: light objects BOUNCED indefinitely on
    #   surfaces (AllegroKuka cube never settled on its table) even though
    #   every shipped config requests restitution 0.  h-invariant, so more
    #   substeps never fixed it.
    # - TANGENTIAL: kappa_t = 0.25 — the stiction anchor spring carries the
    #   static force; the damper only shapes sliding, keep it light.
    kappa = 0.25
    kappa_n = 1.0
    # live contact-multiplicity renormalization (see body_active_counts)
    if n_active is not None:
        gb_idx = jnp.array(model.geom_body, jnp.int32)
        share = 1.0 / n_active[..., gb_idx]
    else:
        share = 1.0
    arrest = kappa * model.geom_meff * share / h  # N per (m/s)
    arrest_n = kappa_n * model.geom_meff * share / h
    # elastic stiffness capped at the explicit stability bound, but against
    # the NORMAL-direction (max) effective mass: a standing anymal foot
    # carries tens of kg along the contact normal even though its swing
    # (min) direction mass is ~0.1 kg.  kappa_el=1.0 keeps omega*h <= 1.
    m_el = model.geom_meff_el if model.geom_meff_el is not None else model.geom_meff
    kn_eff = jnp.minimum(kn, m_el * share / (h * h))

    d_pos = jnp.minimum(jnp.maximum(depth, 0.0), 0.05)
    # SIGNED Hunt-Crossley damping: dissipates on approach AND reduces the
    # spring force during separation (restitution < 1 — approach-only
    # damping returned the stored spring energy nearly elastically, pumping
    # light in-hand objects off the palm); clamped at zero (no adhesion)
    f_damp = jnp.minimum(kd * d_pos, arrest_n) * (-v_n)
    fn = jnp.maximum(kn_eff * d_pos + f_damp, 0.0)
    fn = jnp.where(active, fn, 0.0)

    mu = model.geom_friction
    # anchored-spring stiction (see stiction_force).  Spring stiffness at
    # the explicit stability bound for the MIN-direction effective mass
    # (the swing-direction inertia is what the tangential DOF actually
    # accelerates; the normal-direction m_el would overshoot omega*h);
    # the legacy viscous kt is kept as a damping-slope cap only.
    kt_el = jnp.broadcast_to(
        jnp.minimum(kt, model.geom_meff * share / (h * h)), vt_norm.shape
    )
    ct = jnp.broadcast_to(jnp.minimum(arrest, kt), vt_norm.shape)
    if slip is None:
        slip = jnp.zeros(geom_pos_w.shape, geom_pos_w.dtype)
    mu_b = jnp.broadcast_to(mu, vt_norm.shape)
    ft, slip_new = stiction_force(slip, v_t, n, fn, mu_b, kt_el, ct, h, active)

    f_world = fn[..., None] * n + ft  # (..., ng, 3)

    # scatter to bodies: static geom->body map.  Lever to the CONTACT POINT
    # (sphere bottom): the normal force passes through the center either way
    # (n x n = 0) but friction at the surface must torque the sphere.
    gb = jnp.array(model.geom_body, dtype=jnp.int32)
    nb = model.nb
    lever = geom_pos_w - radius[..., None] * n - body_pos_w[..., gb, :]
    torque = jnp.cross(lever, f_world)

    M = _scatter_matrix(tuple(int(b) for b in model.geom_body), nb)
    body_force = jnp.einsum("...gc,gb->...bc", f_world, M)
    body_torque = jnp.einsum("...gc,gb->...bc", torque, M)

    f_ext_world = jnp.concatenate([body_torque, body_force], axis=-1)
    return f_ext_world, body_force, slip_new


def _surface_closest(kind_arr, local, size):
    """Closest-feature query of a point against sphere/box/capsule surfaces.

    local: (..., np, 3) sphere centers in surface frame; size: (np, 3).
    Returns (normal_local (..., np, 3) pointing AWAY from the surface,
             signed distance from surface boundary to the point (negative
             when the center is inside)).
    Kinds are static per pair; all three branches are computed and selected
    (cheap: np is small, and it keeps one fused kernel).
    """
    eps = 1e-9
    # -- sphere: size[0] = R
    dist_c = jnp.linalg.norm(local, axis=-1)
    n_sph = local / jnp.maximum(dist_c, eps)[..., None]
    d_sph = dist_c - size[..., 0]

    # -- box: size = half extents
    half = size
    q = jnp.clip(local, -half, half)
    delta = local - q
    dist_out = jnp.linalg.norm(delta, axis=-1)
    n_out = delta / jnp.maximum(dist_out, eps)[..., None]
    # inside: distance to nearest face (negative signed distance)
    face = half - jnp.abs(local)  # (..., np, 3) >= 0 when inside
    k = jnp.argmin(face, axis=-1)
    n_in = jnp.sign(
        jnp.take_along_axis(local, k[..., None], axis=-1)
    ) * jax.nn.one_hot(k, 3, dtype=local.dtype)
    d_in = -jnp.take_along_axis(face, k[..., None], axis=-1)[..., 0]
    inside = dist_out <= eps
    n_box = jnp.where(inside[..., None], n_in, n_out)
    d_box = jnp.where(inside, d_in, dist_out)

    # -- capsule: size = [R, half_len]; axis = local z
    seg_z = jnp.clip(local[..., 2], -size[..., 1], size[..., 1])
    d_vec = local - jnp.stack(
        [jnp.zeros_like(seg_z), jnp.zeros_like(seg_z), seg_z], axis=-1
    )
    dist_seg = jnp.linalg.norm(d_vec, axis=-1)
    n_cap = d_vec / jnp.maximum(dist_seg, eps)[..., None]
    d_cap = dist_seg - size[..., 0]

    # -- capped cylinder: size = [R, half_len]; axis = local z (flat caps —
    # the ball_balance tray is a disc, ref: ball_balance.py:162-166)
    rho = jnp.linalg.norm(local[..., 0:2], axis=-1)
    radial_dir = local[..., 0:2] / jnp.maximum(rho, eps)[..., None]
    dr = rho - size[..., 0]
    dz = jnp.abs(local[..., 2]) - size[..., 1]
    out_r = jnp.maximum(dr, 0.0)
    out_z = jnp.maximum(dz, 0.0)
    d_out = jnp.sqrt(out_r * out_r + out_z * out_z)
    d_in = jnp.maximum(dr, dz)  # negative inside
    d_cyl = jnp.where(d_in < 0, d_in, d_out)
    sz = jnp.sign(local[..., 2])
    n_out_vec = jnp.concatenate(
        [out_r[..., None] * radial_dir, (out_z * sz)[..., None]], axis=-1
    )
    n_out_cyl = n_out_vec / jnp.maximum(d_out, eps)[..., None]
    # inside: nearest feature is the cap when dz > dr
    n_cap_in = jnp.concatenate(
        [jnp.zeros_like(radial_dir), sz[..., None]], axis=-1
    )
    n_rad_in = jnp.concatenate(
        [radial_dir, jnp.zeros_like(sz)[..., None]], axis=-1
    )
    n_in_cyl = jnp.where((dz > dr)[..., None], n_cap_in, n_rad_in)
    n_cyl = jnp.where((d_in < 0)[..., None], n_in_cyl, n_out_cyl)

    # -- cylindrical containment band ("wall"): size = [R, half_h, -];
    # the surface is the INSIDE of a cylinder of radius R over |z|<=half_h —
    # distance to the wall is R - rho, normal points INWARD (the arena
    # boundary keeping the object in; ref trifinger.py:187 boundary asset)
    d_wall_band = size[..., 0] - rho
    far = 1e6  # outside the z band: no contact
    in_band = jnp.abs(local[..., 2]) <= size[..., 1]
    d_wall = jnp.where(in_band, d_wall_band, far)
    n_wall = jnp.concatenate(
        [-radial_dir, jnp.zeros_like(local[..., 2:3])], axis=-1
    )

    kind = kind_arr  # (np,) int
    n = n_cap
    n = jnp.where((kind == 0)[..., None], n_sph, n)
    n = jnp.where((kind == 1)[..., None], n_box, n)
    n = jnp.where((kind == 3)[..., None], n_cyl, n)
    n = jnp.where((kind == 4)[..., None], n_wall, n)
    d = d_cap
    d = jnp.where(kind == 0, d_sph, d)
    d = jnp.where(kind == 1, d_box, d)
    d = jnp.where(kind == 3, d_cyl, d)
    d = jnp.where(kind == 4, d_wall, d)
    return n, d


def pair_contact_forces(
    model,
    geom_pos_w: jnp.ndarray,   # (..., ng, 3)
    body_pos_w: jnp.ndarray,   # (..., nb, 3)
    body_R_w: jnp.ndarray,     # (..., nb, 3, 3)
    body_lin_w: jnp.ndarray,   # (..., nb, 3)
    body_ang_w: jnp.ndarray,   # (..., nb, 3)
    h: float,
    n_active: Optional[jnp.ndarray] = None,  # (..., nb) live contact counts
    slip: Optional[jnp.ndarray] = None,      # (..., np, 3) stiction state
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Body-vs-body contact via the static (sphere, surface) pair list.

    Same Hunt-Crossley + anchored-spring stiction law as the ground contact;
    equal-and-opposite forces on both bodies.  Replaces PhysX's rigid-body
    pair contacts for the object-interaction tasks (ball_balance, shadow
    hand cube, franka cube stacking; SURVEY.md §2.1 scene composition).
    Returns (f_ext (..., nb, 6), body_contact_force (..., nb, 3), slip_new).
    """
    pg = jnp.array(model.pair_geom, jnp.int32)
    ps = np.array(model.pair_surf)
    gb = jnp.array([model.geom_body[g] for g in model.pair_geom], jnp.int32)
    sb = jnp.array([model.surf_body[s] for s in model.pair_surf], jnp.int32)
    kind = jnp.array([model.surf_kind[s] for s in model.pair_surf], jnp.int32)

    c = geom_pos_w[..., pg, :]  # (..., np, 3)
    # `[..., pg]`-style gathers keep the index on the geom/surface axis when
    # the leaf is DR-batched per env (object-dimension randomization)
    r = model.geom_radius[..., pg]
    size = model.surf_size[..., ps, :]
    # surface frame in world
    Rb = body_R_w[..., sb, :, :]
    R_s = Rb @ model.surf_rotm[ps]
    p_s = body_pos_w[..., sb, :] + jnp.einsum(
        "...nij,...nj->...ni", Rb,
        jnp.broadcast_to(model.surf_offset[..., ps, :], c.shape),
    )
    local = jnp.einsum("...nji,...nj->...ni", R_s, c - p_s)
    n_local, d_surf = _surface_closest(kind, local, size)
    n = jnp.einsum("...nij,...nj->...ni", R_s, n_local)  # world, away from surf
    depth = r - d_surf  # penetration of the sphere into the surface
    active = depth > 0.0

    # contact point: on the sphere toward the surface
    x_c = c - n * r[..., None]
    lever_g = x_c - body_pos_w[..., gb, :]
    lever_s = x_c - body_pos_w[..., sb, :]
    v_g = body_lin_w[..., gb, :] + jnp.cross(body_ang_w[..., gb, :], lever_g)
    v_s = body_lin_w[..., sb, :] + jnp.cross(body_ang_w[..., sb, :], lever_s)
    v_rel = v_g - v_s
    v_n = jnp.sum(v_rel * n, axis=-1)
    v_t = v_rel - v_n[..., None] * n
    vt_norm = jnp.linalg.norm(v_t, axis=-1)

    kn = model.contact_stiffness
    kd = model.contact_damping
    kt = model.tangential_stiffness
    # `[..., pg]` keeps the gather on the geom axis when geom_meff is
    # DR-batched to (N, ng).  Each side's effective mass is divided by its
    # body's LIVE active-contact count (see body_active_counts).
    if n_active is not None:
        share_g = 1.0 / n_active[..., gb]
        share_s = 1.0 / n_active[..., sb]
    else:
        share_g = share_s = 1.0
    m_g = model.geom_meff[..., pg] * share_g
    m_s = model.surf_meff[..., ps] * share_s
    m_pair = m_g * m_s / (m_g + m_s)  # reduced mass of the pair
    kappa = 0.25
    kappa_n = 1.0  # deadbeat normal damping cap (see the ground path)
    arrest = kappa * m_pair / h
    arrest_n = kappa_n * m_pair / h
    m_g_el = (model.geom_meff_el if model.geom_meff_el is not None else model.geom_meff)[..., pg] * share_g
    m_s_el = (model.surf_meff_el if model.surf_meff_el is not None else model.surf_meff)[..., ps] * share_s
    m_pair_el = m_g_el * m_s_el / (m_g_el + m_s_el)
    kn_eff = jnp.minimum(kn, m_pair_el / (h * h))

    d_pos = jnp.minimum(jnp.maximum(depth, 0.0), 0.05)
    # signed Hunt-Crossley damping, clamped to no adhesion (see the ground
    # contact above: approach-only damping made pair contacts near-elastic)
    f_damp = jnp.minimum(kd * d_pos, arrest_n) * (-v_n)
    fn = jnp.maximum(kn_eff * d_pos + f_damp, 0.0)
    fn = jnp.where(active, fn, 0.0)

    mu = jnp.sqrt(
        model.geom_friction[..., pg] * model.surf_friction[..., ps]
    )
    # anchored-spring stiction on the pair's reduced min-direction mass
    # (see stiction_force / the ground path above)
    kt_el = jnp.broadcast_to(jnp.minimum(kt, m_pair / (h * h)), vt_norm.shape)
    ct = jnp.broadcast_to(jnp.minimum(arrest, kt), vt_norm.shape)
    if slip is None:
        slip = jnp.zeros(c.shape, c.dtype)
    mu_b = jnp.broadcast_to(mu, vt_norm.shape)
    ft, slip_new = stiction_force(slip, v_t, n, fn, mu_b, kt_el, ct, h, active)
    f = fn[..., None] * n + ft  # force ON the sphere body

    nb = model.nb
    Mg = _scatter_matrix(
        tuple(int(model.geom_body[g]) for g in model.pair_geom), nb
    )
    Ms = _scatter_matrix(
        tuple(int(model.surf_body[s_]) for s_ in model.pair_surf), nb
    )
    body_force = (
        jnp.einsum("...pc,pb->...bc", f, Mg)
        - jnp.einsum("...pc,pb->...bc", f, Ms)
    )
    body_torque = (
        jnp.einsum("...pc,pb->...bc", jnp.cross(lever_g, f), Mg)
        + jnp.einsum("...pc,pb->...bc", jnp.cross(lever_s, -f), Ms)
    )
    f_ext = jnp.concatenate([body_torque, body_force], axis=-1)
    return f_ext, body_force, slip_new


def _sdf_queries(model, geom_pos_w, body_pos_w, body_R_w):
    """Per-SDF trilinear (depth, world normal, gathered indices) lists.

    Shared by sdf_active and sdf_contact_forces; XLA CSEs the duplicate."""
    from isaacgymenv_tpu.physics import sdf as sdf_mod

    out = []
    for k in range(model.n_sdf):
        pg = jnp.array(model.sdf_pair_geom[k], jnp.int32)
        if len(model.sdf_pair_geom[k]) == 0:
            out.append(None)
            continue
        b = model.sdf_body[k]
        Rb = body_R_w[..., b, :, :]
        c = geom_pos_w[..., pg, :]
        local = jnp.einsum(
            "...ji,...nj->...ni", Rb, c - body_pos_w[..., b, None, :]
        )
        d, grad = sdf_mod.sdf_query(
            model.sdf_dist[k],
            model.sdf_origin[k],
            model.sdf_spacing[k],
            local,
        )
        n_local = grad / jnp.maximum(
            jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9
        )
        n_world = jnp.einsum("...ij,...nj->...ni", Rb, n_local)
        depth = model.geom_radius[pg] - d
        out.append((pg, depth, n_world, c))
    return out


def sdf_active(model, geom_pos_w, body_pos_w, body_R_w):
    """Per-SDF active-contact masks (for body_active_counts)."""
    acts = []
    for q in _sdf_queries(model, geom_pos_w, body_pos_w, body_R_w):
        acts.append(None if q is None else (q[1] > 0.0))
    return acts


def sdf_contact_forces(
    model,
    geom_pos_w: jnp.ndarray,   # (..., ng, 3)
    body_pos_w: jnp.ndarray,   # (..., nb, 3)
    body_R_w: jnp.ndarray,     # (..., nb, 3, 3)
    body_lin_w: jnp.ndarray,
    body_ang_w: jnp.ndarray,
    h: float,
    n_active: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contact spheres vs signed-distance-field mesh colliders.

    The PhysX SDF mesh collision equivalent (ref: factory_base.py:483):
    trilinear grid query gives penetration depth + normal; the force law is
    the same Hunt-Crossley + momentum-capped stiction as the primitive-pair
    path, equal-and-opposite between the sphere's body and the SDF's body.
    Returns (f_ext (..., nb, 6), body_contact_force (..., nb, 3)).
    """
    nb = model.nb
    batch = geom_pos_w.shape[:-2]
    body_force = jnp.zeros(batch + (nb, 3), geom_pos_w.dtype)
    body_torque = jnp.zeros(batch + (nb, 3), geom_pos_w.dtype)

    kn = model.contact_stiffness
    kd = model.contact_damping
    kt = model.tangential_stiffness
    queries = _sdf_queries(model, geom_pos_w, body_pos_w, body_R_w)
    for k, q in enumerate(queries):
        if q is None:
            continue
        pg, depth, n, c = q
        sb = model.sdf_body[k]
        gb = jnp.array([model.geom_body[g] for g in model.sdf_pair_geom[k]], jnp.int32)
        r = model.geom_radius[pg]
        active = depth > 0.0

        x_c = c - n * r[..., None]
        lever_g = x_c - body_pos_w[..., gb, :]
        lever_s = x_c - body_pos_w[..., sb, None, :]
        v_g = body_lin_w[..., gb, :] + jnp.cross(body_ang_w[..., gb, :], lever_g)
        v_s = body_lin_w[..., sb, None, :] + jnp.cross(
            body_ang_w[..., sb, None, :], lever_s
        )
        v_rel = v_g - v_s
        v_n = jnp.sum(v_rel * n, axis=-1)
        v_t = v_rel - v_n[..., None] * n
        vt_norm = jnp.linalg.norm(v_t, axis=-1)

        if n_active is not None:
            share_g = 1.0 / n_active[..., gb]
            share_s = 1.0 / n_active[..., sb, None]
        else:
            share_g = share_s = 1.0
        m_g = model.geom_meff[..., pg] * share_g
        m_s = model.sdf_meff[k] * share_s
        m_pair = m_g * m_s / (m_g + m_s)
        kappa = 0.25
        kappa_n = 1.0  # deadbeat normal damping cap (see the ground path)
        arrest = kappa * m_pair / h
        arrest_n = kappa_n * m_pair / h
        m_g_el = (
            model.geom_meff_el if model.geom_meff_el is not None else model.geom_meff
        )[..., pg] * share_g
        m_s_el = (
            model.sdf_meff_el if model.sdf_meff_el is not None else model.sdf_meff
        )[k] * share_s
        m_pair_el = m_g_el * m_s_el / (m_g_el + m_s_el)
        kn_eff = jnp.minimum(kn, m_pair_el / (h * h))

        d_pos = jnp.minimum(jnp.maximum(depth, 0.0), 0.05)
        f_damp = jnp.minimum(kd * d_pos, arrest_n) * (-v_n)
        fn = jnp.maximum(kn_eff * d_pos + f_damp, 0.0)
        fn = jnp.where(active, fn, 0.0)

        mu = jnp.sqrt(model.geom_friction[..., pg] * model.sdf_friction[k])
        ft_mag = jnp.minimum(jnp.minimum(arrest, kt) * vt_norm, mu * fn)
        ft = -v_t / jnp.maximum(vt_norm, 1e-6)[..., None] * ft_mag[..., None]
        f = fn[..., None] * n + ft  # force ON the sphere body

        body_force = body_force.at[..., gb, :].add(f)
        body_torque = body_torque.at[..., gb, :].add(jnp.cross(lever_g, f))
        body_force = body_force.at[..., sb, :].add(-jnp.sum(f, axis=-2))
        body_torque = body_torque.at[..., sb, :].add(
            -jnp.sum(jnp.cross(lever_s, f), axis=-2)
        )
    f_ext = jnp.concatenate([body_torque, body_force], axis=-1)
    return f_ext, body_force


def anchor_forces(
    model,
    body_pos_w: jnp.ndarray,
    body_R_w: jnp.ndarray,
    body_lin_w: jnp.ndarray,
    body_ang_w: jnp.ndarray,
    h: float,
) -> jnp.ndarray:
    """Translation point constraints pinning body points to world targets.

    PhysX attractor equivalent (ref: ball_balance.py:305-318, stiffness 5e7
    translation-only).  Implemented as the stiffest spring-damper stable at
    the substep size: f = -(kp*m/h^2) d - (kd*m/h) v — Baumgarte-style soft
    constraint, unconditionally stable with no tuning.
    Returns f_ext (..., nb, 6) world [moment, force] about body origins.
    """
    ab = jnp.array(model.anchor_body, jnp.int32)
    off = model.anchor_offset
    Rb = body_R_w[..., ab, :, :]
    p = body_pos_w[..., ab, :] + jnp.einsum(
        "...nij,...nj->...ni", Rb, jnp.broadcast_to(off, body_pos_w[..., ab, :].shape)
    )
    lever = p - body_pos_w[..., ab, :]
    v = body_lin_w[..., ab, :] + jnp.cross(body_ang_w[..., ab, :], lever)
    m = model.anchor_meff
    kp = 0.2 * m / (h * h)
    kd = 0.7 * m / h
    f = -kp[..., None] * (p - model.anchor_target) - kd[..., None] * v

    nb = model.nb
    batch = f.shape[:-2]
    body_force = jnp.zeros(batch + (nb, 3), f.dtype).at[..., ab, :].add(f)
    body_torque = jnp.zeros(batch + (nb, 3), f.dtype).at[..., ab, :].add(
        jnp.cross(lever, f)
    )
    return jnp.concatenate([body_torque, body_force], axis=-1)
