"""SimModel / SimState — the data model of the TPU-native physics engine.

Replaces the reference's PhysX scene + gymtorch-aliased GPU buffers
(SURVEY.md §2.1: state tensor API, `acquire_*_tensor`).  On TPU the sim
state simply *is* a JAX pytree; no bridge is needed.

Design rules
------------
- **Topology is static** (python ints/tuples, not traced): body count,
  parents, joint types, dof addressing.  XLA unrolls per-body loops.
- **Parameters are array leaves** and may carry a leading env-batch axis for
  domain randomization (per-env mass/friction/gains).  All dynamics code is
  written with `...`-broadcasting so an unbatched `(nb,)` leaf and a batched
  `(N, nb)` leaf both work without vmap plumbing.
- **State is batched**: `q` is `(N, nq)`, `qd` is `(N, nv)`.

Conventions match Isaac Gym for API fidelity:
- quaternions are (x, y, z, w),
- actor root state is 13 floats [pos3, quat4, linvel3, angvel3] (world frame),
- DOF state is [pos, vel] per 1-DoF joint (ref: tasks/anymal.py:110-126).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Joint types (static ints)
JT_FREE = 0       # 6-DoF floating root: q = [pos3, quat4], qd = [ang3, lin3] body frame
JT_REVOLUTE = 1   # 1-DoF hinge
JT_PRISMATIC = 2  # 1-DoF slider
JT_FIXED = 3      # 0-DoF weld
JT_SCREW = 4      # 1-DoF helical: rotation about axis coupled to translation
#                   along it by pitch/2pi (idealizes the Factory nut-on-bolt
#                   thread constraint, ref: factory SDF thread collisions)

# DOF drive modes (mirror gymapi.DOF_MODE_*; ref: tasks/cartpole.py:110-113)
DRIVE_NONE = 0
DRIVE_POS = 1
DRIVE_VEL = 2
DRIVE_EFFORT = 3


@struct.dataclass
class SimModel:
    """Static articulated model (a forest of kinematic trees per env).

    Built host-side by the URDF/MJCF loaders (replaces `gym.load_asset`,
    ref: tasks/ant.py:154-160).  One SimModel describes the scene replicated
    across all envs; DR may batch individual leaves with a leading env axis.
    """

    # --- static topology (not traced) ---
    nb: int = struct.field(pytree_node=False)            # number of bodies
    nq: int = struct.field(pytree_node=False)            # generalized positions
    nv: int = struct.field(pytree_node=False)            # generalized velocities
    nd: int = struct.field(pytree_node=False)            # 1-DoF joint count (Isaac num_dof)
    parent: Tuple[int, ...] = struct.field(pytree_node=False)   # parent body (-1 = world)
    jtype: Tuple[int, ...] = struct.field(pytree_node=False)    # per-body joint type
    q_adr: Tuple[int, ...] = struct.field(pytree_node=False)    # per-body q start index
    v_adr: Tuple[int, ...] = struct.field(pytree_node=False)    # per-body qd start index
    dof_body: Tuple[int, ...] = struct.field(pytree_node=False)  # per-dof owning body
    dof_v_adr: Tuple[int, ...] = struct.field(pytree_node=False)  # per-dof index into qd
    dof_q_adr: Tuple[int, ...] = struct.field(pytree_node=False)  # per-dof index into q
    actor_root: Tuple[int, ...] = struct.field(pytree_node=False)  # root body per actor
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    dof_names: Tuple[str, ...] = struct.field(pytree_node=False)
    geom_body: Tuple[int, ...] = struct.field(pytree_node=False)  # contact sphere -> body

    # --- joint placement (array leaves; broadcastable) ---
    joint_pos: jnp.ndarray    # (nb, 3) joint frame origin in parent frame
    joint_quat: jnp.ndarray   # (nb, 4) joint frame rotation in parent frame (xyzw)
    joint_axis: jnp.ndarray   # (nb, 3) motion axis in child frame (1-DoF joints)

    # --- body inertial params ---
    body_mass: jnp.ndarray     # (nb,)
    body_com: jnp.ndarray      # (nb, 3) COM offset in body frame
    body_inertia: jnp.ndarray  # (nb, 3, 3) rotational inertia about COM, body frame

    # --- per-DoF params (length nd) ---
    dof_lower: jnp.ndarray
    dof_upper: jnp.ndarray
    dof_effort: jnp.ndarray      # torque/force limit
    dof_maxvel: jnp.ndarray
    dof_armature: jnp.ndarray
    dof_friction: jnp.ndarray    # joint friction (viscous-regularized Coulomb)
    dof_stiffness: jnp.ndarray   # PD drive Kp
    dof_damping: jnp.ndarray     # PD drive Kd
    dof_drive_mode: jnp.ndarray  # (nd,) int32 DRIVE_*
    dof_has_limit: jnp.ndarray   # (nd,) bool

    # --- contact geometry: spheres attached to bodies ---
    geom_offset: jnp.ndarray   # (ng, 3) body-frame offset
    geom_radius: jnp.ndarray   # (ng,)
    geom_friction: jnp.ndarray  # (ng,) Coulomb mu
    geom_meff: jnp.ndarray     # (ng,) articulated effective mass at contact
    #                            point (build-time, default-pose estimate;
    #                            bounds the impulse-capped contact forces)

    # --- world ---
    gravity: jnp.ndarray       # (3,)

    # --- contact solver params (soft penalty contact) ---
    contact_stiffness: jnp.ndarray  # scalar
    contact_damping: jnp.ndarray    # scalar
    tangential_stiffness: jnp.ndarray  # scalar

    # --- body-vs-body contact: surface primitives + static pair list ---
    # Surfaces are the "receiving" colliders (sphere/box/capsule); contact
    # spheres (geom_*) test against surfaces of OTHER actors.  Pairs are
    # enumerated at build time (builder.finalize) — no broadphase needed at
    # the scales of the reference's scenes (hand+cube, ball+tray, ...).
    surf_body: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    surf_kind: Tuple[int, ...] = struct.field(pytree_node=False, default=())  # 0 sphere, 1 box, 2 capsule, 3 cylinder
    pair_geom: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    pair_surf: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    surf_offset: Optional[jnp.ndarray] = None  # (ns, 3) body-frame position
    surf_rotm: Optional[jnp.ndarray] = None    # (ns, 3, 3) body-frame rotation
    surf_size: Optional[jnp.ndarray] = None    # (ns, 3): sphere [r,-,-]; box half-extents; capsule [r, half_len, -]
    surf_friction: Optional[jnp.ndarray] = None  # (ns,)
    surf_meff: Optional[jnp.ndarray] = None      # (ns,) effective mass at surface

    # --- world anchors: translation point constraints (PhysX attractor
    # equivalent, ref: ball_balance.py:305-318 create_rigid_body_attractor).
    # Implemented as momentum-capped spring-dampers — the max gain stable at
    # the substep size, instead of the reference's 5e7 raw stiffness.
    anchor_body: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    anchor_offset: Optional[jnp.ndarray] = None  # (na, 3) body-frame point
    anchor_target: Optional[jnp.ndarray] = None  # (na, 3) world target
    anchor_meff: Optional[jnp.ndarray] = None    # (na,)

    # --- per-body gravity compensation (asset disable_gravity equivalent,
    # ref: franka_cabinet.py:149): 1.0 = fully compensated ---
    body_gravcomp: Optional[jnp.ndarray] = None  # (nb,)

    # --- fixed tendons: linear couplings L = sum(coef * q) with range
    # limits (MJCF <tendon><fixed>; shadow hand distal-joint coupling,
    # ref: shadow_hand.py:260-271 tendon limit_stiffness setup) ---
    tendon_dof: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False, default=())  # (nt, 2)
    tendon_coef: Optional[jnp.ndarray] = None   # (nt, 2)
    tendon_range: Optional[jnp.ndarray] = None  # (nt, 2) [lo, hi]
    tendon_k: Optional[jnp.ndarray] = None      # (nt,) limit stiffness
    tendon_d: Optional[jnp.ndarray] = None      # (nt,) damping

    # --- max-direction effective masses for the ELASTIC contact-stiffness
    # cap: the normal-direction load path (e.g. a standing foot carrying the
    # trunk) is far heavier than the min/tangential direction that bounds
    # the damping/friction impulses (geom_meff) ---
    geom_meff_el: Optional[jnp.ndarray] = None  # (ng,)
    surf_meff_el: Optional[jnp.ndarray] = None  # (ns,)

    # --- per-body screw-joint thread pitch [m/rev]; 0 for non-screw joints ---
    joint_pitch: Tuple[float, ...] = struct.field(pytree_node=False, default=())

    # --- force sensors: bodies whose inbound-joint reaction wrench is
    # reported in SimState.joint_wrench (the acquire_force_sensor_tensor
    # equivalent, ref: tasks/ant.py:80-83 foot sensors,
    # tasks/ball_balance.py:271 tray sensor) ---
    sensor_body: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    # --- static signed-distance-field mesh colliders (PhysX SDF mesh
    # collision equivalent, ref: factory/factory_base.py:483): per-SDF voxel
    # distance grid rigidly attached to a body; contact spheres of OTHER
    # actors query it trilinearly (physics/sdf.py, contact.sdf_contact_forces).
    # Grids may differ in resolution, so they are a tuple of leaves. ---
    # Scene flag: no geom can ever reach the world ground plane (e.g. the
    # fixed-base in-hand manipulation scenes, where the object resets on
    # fall distance far above z=0 — ref ShadowHand fallDistance 0.24 vs the
    # hand mounted at z~0.5).  Skips the whole ground-contact pass; pair
    # contacts are unaffected.  Purely an optimization switch: dynamics are
    # bitwise identical when the flag is truthful.
    no_ground: bool = struct.field(pytree_node=False, default=False)

    sdf_body: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    sdf_pair_geom: Tuple[Tuple[int, ...], ...] = struct.field(
        pytree_node=False, default=()
    )  # per-SDF geom indices colliding against it
    sdf_dist: Tuple[jnp.ndarray, ...] = ()  # per-SDF (D, H, W) signed distances
    sdf_origin: Optional[jnp.ndarray] = None   # (nf, 3) grid origin, body frame
    sdf_spacing: Optional[jnp.ndarray] = None  # (nf,) meters per cell
    sdf_friction: Optional[jnp.ndarray] = None  # (nf,)
    sdf_meff: Optional[jnp.ndarray] = None      # (nf,) effective mass
    sdf_meff_el: Optional[jnp.ndarray] = None   # (nf,) elastic-cap mass

    @property
    def ng(self) -> int:
        return len(self.geom_body)

    @property
    def n_pairs(self) -> int:
        return len(self.pair_geom)

    @property
    def n_sdf(self) -> int:
        return len(self.sdf_body)

    @property
    def n_actors(self) -> int:
        return len(self.actor_root)

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)

    def dof_index(self, name: str) -> int:
        return self.dof_names.index(name)


@struct.dataclass
class SimState:
    """Batched dynamic state + step-derived caches.

    `q`/`qd` are the source of truth; the derived fields are refreshed by
    `engine.forward`/`engine.step` (the functional analog of the reference's
    `gym.refresh_*_tensor` calls, ref: tasks/anymal.py:257-261 — here they are
    always consistent after a step, eliminating the refresh-ordering hazard
    documented in SURVEY.md §5.2).

    Layouts (Isaac parity):
    - body_pos/quat: body frame origin pose in env-local world frame
    - body_linvel: world-frame velocity of the body frame origin
    - body_angvel: world-frame angular velocity
    - contact_force: (N, nb, 3) net contact force per body, world frame
      (ref: acquire_net_contact_force_tensor)
    """

    q: jnp.ndarray            # (N, nq)
    qd: jnp.ndarray           # (N, nv)
    body_pos: jnp.ndarray     # (N, nb, 3)
    body_quat: jnp.ndarray    # (N, nb, 4)
    body_linvel: jnp.ndarray  # (N, nb, 3)
    body_angvel: jnp.ndarray  # (N, nb, 3)
    contact_force: jnp.ndarray  # (N, nb, 3)
    contact_torque: jnp.ndarray  # (N, nb, 3) moment about body origin, world frame
    dof_force: jnp.ndarray    # (N, nd) total applied joint force (ref: acquire_dof_force_tensor)
    # (N, ns, 6) [force, torque] transmitted through each sensor body's
    # inbound joint, body frame — force-sensor readings
    # (ref: acquire_force_sensor_tensor layout: force3 then torque3).
    # None when the model declares no sensors (model.sensor_body empty).
    joint_wrench: Optional[jnp.ndarray] = None
    # Tangential slip-spring displacement per ground contact (N, ng, 3) and
    # per pair contact (N, n_pairs, 3), world frame.  The stiction state:
    # friction is an anchored spring f_t = -k_t s - c_t v_t projected to the
    # Coulomb cone (contact.py), so a loaded stance foot holds position with
    # zero steady-state creep — the PhysX TGS position-iteration equivalent.
    # (A prior viscous-only law made force proportional to slip VELOCITY:
    # feet skated under load and quadrupeds could only track ~half their
    # commanded velocity.)  None until the first engine.step normalizes it.
    slip_g: Optional[jnp.ndarray] = None
    slip_p: Optional[jnp.ndarray] = None

    @property
    def N(self) -> int:
        return self.q.shape[0]


def make_zero_state(model: SimModel, n_envs: int, dtype=jnp.float32) -> SimState:
    """Allocate an all-zero state with identity quaternions."""
    q = jnp.zeros((n_envs, model.nq), dtype)
    # identity quats for free roots
    for b in range(model.nb):
        if model.jtype[b] == JT_FREE:
            q = q.at[:, model.q_adr[b] + 6].set(1.0)  # w component of xyzw at pos3+quat4
    return SimState(
        q=q,
        qd=jnp.zeros((n_envs, model.nv), dtype),
        body_pos=jnp.zeros((n_envs, model.nb, 3), dtype),
        body_quat=jnp.zeros((n_envs, model.nb, 4), dtype).at[..., 3].set(1.0),
        body_linvel=jnp.zeros((n_envs, model.nb, 3), dtype),
        body_angvel=jnp.zeros((n_envs, model.nb, 3), dtype),
        contact_force=jnp.zeros((n_envs, model.nb, 3), dtype),
        contact_torque=jnp.zeros((n_envs, model.nb, 3), dtype),
        dof_force=jnp.zeros((n_envs, model.nd), dtype),
        joint_wrench=(
            jnp.zeros((n_envs, len(model.sensor_body), 6), dtype)
            if model.sensor_body else None
        ),
        slip_g=jnp.zeros((n_envs, model.ng, 3), dtype) if model.ng else None,
        slip_p=(
            jnp.zeros((n_envs, model.n_pairs, 3), dtype)
            if model.n_pairs else None
        ),
    )


# ---------------------------------------------------------------------------
# Isaac-parity state views (ref SURVEY.md §2.1 state tensor API)
# ---------------------------------------------------------------------------


def dof_pos(model: SimModel, state: SimState) -> jnp.ndarray:
    """(N, nd) DOF positions — gather of q at static indices."""
    idx = jnp.array(model.dof_q_adr, dtype=jnp.int32)
    return state.q[..., idx]


def dof_vel(model: SimModel, state: SimState) -> jnp.ndarray:
    """(N, nd) DOF velocities."""
    idx = jnp.array(model.dof_v_adr, dtype=jnp.int32)
    return state.qd[..., idx]


def set_dof_state(model: SimModel, state: SimState, pos: jnp.ndarray, vel: jnp.ndarray) -> SimState:
    """Functional write of all DOF positions/velocities (ref: set_dof_state_tensor)."""
    qi = jnp.array(model.dof_q_adr, dtype=jnp.int32)
    vi = jnp.array(model.dof_v_adr, dtype=jnp.int32)
    return state.replace(q=state.q.at[..., qi].set(pos), qd=state.qd.at[..., vi].set(vel))


def root_state(model: SimModel, state: SimState) -> jnp.ndarray:
    """(N, n_actors, 13) actor root states [pos3, quat4, linvel3, angvel3].

    World-frame velocities, matching the reference's root state tensor
    (ref: tasks/anymal.py:110-126).
    """
    roots = list(model.actor_root)
    pos = state.body_pos[..., roots, :]
    quat = state.body_quat[..., roots, :]
    linvel = state.body_linvel[..., roots, :]
    angvel = state.body_angvel[..., roots, :]
    return jnp.concatenate([pos, quat, linvel, angvel], axis=-1)


def set_root_state(model: SimModel, state: SimState, rs: jnp.ndarray) -> SimState:
    """Functional write of actor root states (ref: set_actor_root_state_tensor).

    Only free-base actors are affected (fixed-base roots have no q entries).
    rs: (N, n_actors, 13) or (N, 13) when there is a single actor; velocities
    are world-frame per Isaac layout and converted to the internal body-frame
    spatial velocity [omega_b, v_b] stored in qd for free joints.

    NOTE: call `engine.forward` afterwards to refresh the derived caches.
    """
    from isaacgymenv_tpu.ops import maths

    if rs.ndim == state.q.ndim:  # (N, 13) single actor convenience
        rs = rs[..., None, :]
    q, qd = state.q, state.qd
    for a, b in enumerate(model.actor_root):
        if model.jtype[b] != JT_FREE:
            continue
        qa = model.q_adr[b]
        va = model.v_adr[b]
        quat = maths.quat_unit(rs[..., a, 3:7])
        q = q.at[..., qa : qa + 3].set(rs[..., a, 0:3])
        q = q.at[..., qa + 3 : qa + 7].set(quat)
        omega_b = maths.quat_rotate_inverse(quat, rs[..., a, 10:13])
        v_b = maths.quat_rotate_inverse(quat, rs[..., a, 7:10])
        qd = qd.at[..., va : va + 3].set(omega_b)
        qd = qd.at[..., va + 3 : va + 6].set(v_b)
    return state.replace(q=q, qd=qd)
