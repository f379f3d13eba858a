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

import jax.numpy as jnp
from flax import struct


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


def contact_forces(
    model,
    terrain: Optional[Heightfield],
    geom_pos_w: jnp.ndarray,   # (..., ng, 3) world positions of contact spheres
    geom_vel_w: jnp.ndarray,   # (..., ng, 3) world velocities of sphere centers
    body_pos_w: jnp.ndarray,   # (..., nb, 3) body origins (for torque levers)
    h: float = 1e-2,           # substep size (for impulse-capped damping)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute per-body external spatial forces from ground contact.

    Returns:
      f_ext_world: (..., nb, 6) spatial [moment, force] per body about the
                   body origin, world axes — feeds `dynamics.rnea_bias`.
      body_contact_force: (..., nb, 3) net world contact force per body —
                   the `net_contact_force_tensor` equivalent used by
                   termination logic (ref: tasks/anymal.py:331-337).
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
    kappa = 0.25
    arrest = kappa * model.geom_meff / h  # N per (m/s)

    d_pos = jnp.minimum(jnp.maximum(depth, 0.0), 0.05)
    approach = jnp.maximum(-v_n, 0.0)
    f_damp = jnp.minimum(kd * d_pos, arrest) * approach
    fn = kn * d_pos + f_damp
    fn = jnp.where(active, fn, 0.0)

    mu = model.geom_friction
    # near-ideal stiction: arrest tangential momentum, clamped to the
    # Coulomb cone (replaces the tuned viscous kt; kt retained as a cap)
    ft_mag = jnp.minimum(jnp.minimum(arrest, kt) * vt_norm, mu * fn)
    ft = -v_t / jnp.maximum(vt_norm, 1e-6)[..., None] * ft_mag[..., None]

    f_world = fn[..., None] * n + ft  # (..., ng, 3)

    # scatter to bodies: static geom->body map
    gb = jnp.array(model.geom_body, dtype=jnp.int32)
    nb = model.nb
    lever = geom_pos_w - body_pos_w[..., gb, :]
    torque = jnp.cross(lever, f_world)

    batch = f_world.shape[:-2]
    body_force = jnp.zeros(batch + (nb, 3), f_world.dtype)
    body_torque = jnp.zeros(batch + (nb, 3), f_world.dtype)
    body_force = body_force.at[..., gb, :].add(f_world)
    body_torque = body_torque.at[..., gb, :].add(torque)

    f_ext_world = jnp.concatenate([body_torque, body_force], axis=-1)
    return f_ext_world, body_force
