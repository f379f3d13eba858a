"""The simulation step: actuation -> contacts -> forward dynamics -> integrate.

Functional equivalent of the reference hot loop
`gym.simulate(sim)` × substeps (ref: tasks/base/vec_task.py:379-382), as one
pure function `step(model, terrain, state, ctrl) -> state` that jits into a
single fused XLA program over the env batch.

Stability notes (TPU-first design):
- Joint drive damping and joint friction are integrated *implicitly*
  (dt·diag(d) added to the mass matrix) so PhysX-scale PD gains
  (e.g. Anymal Kp=85/Kd=2, ref: tasks/anymal.py:199-203) are stable at
  explicit-integrator substep sizes.
- Contacts are compliant penalty springs (physics/contact.py).
- Semi-implicit Euler: qd first, then q with the new qd.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from isaacgymenv_tpu.ops import maths
from isaacgymenv_tpu.physics import contact as contact_mod
from isaacgymenv_tpu.physics import dynamics, kinematics
from isaacgymenv_tpu.physics.types import (
    DRIVE_EFFORT,
    DRIVE_NONE,
    DRIVE_POS,
    DRIVE_VEL,
    JT_FREE,
    SimModel,
    SimState,
)


@struct.dataclass
class Control:
    """Per-step actuation inputs (held constant across substeps, matching
    PhysX drive-target semantics; ref: set_dof_position_target_tensor,
    set_dof_actuation_force_tensor).

    All arrays broadcast against (N, nd); `body_wrench` is (N, nb, 6) world
    [moment, force] for `apply_rigid_body_force_tensors` equivalents
    (quadcopter/ingenuity thrust, push randomization).
    """

    pos_target: jnp.ndarray
    vel_target: jnp.ndarray
    effort: jnp.ndarray
    body_wrench: Optional[jnp.ndarray] = None

    @classmethod
    def zero(cls, model: SimModel, n_envs: int, dtype=jnp.float32) -> "Control":
        z = jnp.zeros((n_envs, model.nd), dtype)
        return cls(pos_target=z, vel_target=z, effort=z, body_wrench=None)


# joint-limit penalty spring/damper (soft limits; PhysX enforces via solver)
_LIMIT_STIFFNESS = 4000.0
_LIMIT_DAMPING = 40.0
# regularization velocity for Coulomb joint friction
_FRICTION_VEL_EPS = 0.05


def _dof_arrays(model: SimModel, state: SimState):
    qi = jnp.array(model.dof_q_adr, dtype=jnp.int32)
    vi = jnp.array(model.dof_v_adr, dtype=jnp.int32)
    return state.q[..., qi], state.qd[..., vi], qi, vi


def actuation_force(model: SimModel, dof_pos, dof_vel, ctrl: Control):
    """Applied joint force per drive mode, clamped to effort limits."""
    mode = model.dof_drive_mode
    kp = model.dof_stiffness
    kd = model.dof_damping
    pd_pos = kp * (ctrl.pos_target - dof_pos) - kd * dof_vel
    pd_vel = kd * (ctrl.vel_target - dof_vel)
    tau = jnp.where(mode == DRIVE_POS, pd_pos, 0.0)
    tau = jnp.where(mode == DRIVE_VEL, pd_vel, tau)
    tau = jnp.where(mode == DRIVE_EFFORT, ctrl.effort, tau)
    return jnp.clip(tau, -model.dof_effort, model.dof_effort)


def passive_force(model: SimModel, dof_pos, dof_vel):
    """Soft joint-limit springs + regularized Coulomb joint friction +
    passive joint damping (drive-less modes) + fixed-tendon limits."""
    below = jnp.minimum(dof_pos - model.dof_lower, 0.0)
    above = jnp.maximum(dof_pos - model.dof_upper, 0.0)
    has_limit = model.dof_has_limit
    tau_lim = jnp.where(
        has_limit,
        -_LIMIT_STIFFNESS * (below + above)
        - _LIMIT_DAMPING * dof_vel * ((below < 0.0) | (above > 0.0)),
        0.0,
    )
    tau_fric = -model.dof_friction * jnp.tanh(dof_vel / _FRICTION_VEL_EPS)
    # MJCF-style passive joint damping: for POS/VEL drives the damping acts
    # inside the drive (actuation_force); for NONE/EFFORT it is passive
    # (shadow hand's 4 tendon-coupled distal joints are damped but driveless)
    mode = model.dof_drive_mode
    passive_damped = (mode == DRIVE_NONE) | (mode == DRIVE_EFFORT)
    tau_damp = jnp.where(passive_damped, -model.dof_damping * dof_vel, 0.0)
    tau = tau_lim + tau_fric + tau_damp
    if model.tendon_dof:
        td = jnp.array(model.tendon_dof, jnp.int32)  # (nt, k)
        tc = model.tendon_coef
        L = jnp.sum(dof_pos[..., td] * tc, axis=-1)
        Ld = jnp.sum(dof_vel[..., td] * tc, axis=-1)
        lo, hi = model.tendon_range[..., 0], model.tendon_range[..., 1]
        viol = jnp.maximum(L - hi, 0.0) + jnp.minimum(L - lo, 0.0)
        f_t = -model.tendon_k * viol - model.tendon_d * Ld * (jnp.abs(viol) > 0)
        # generalized force: dL/dq = coef
        tau = tau.at[..., td].add(f_t[..., None] * tc)
    return tau


def _implicit_drive_terms(model: SimModel, h: float, dof_pos: jnp.ndarray) -> jnp.ndarray:
    """Mass-matrix diagonal augmentation for implicit spring-dampers.

    PhysX integrates joint drives AND limits implicitly (TGS), which is what
    makes Kp=85/Kd=2 drives and hard limits stable at coarse steps in the
    reference.  The backward-Euler linearization of a spring-damper adds
    h*Kd + h^2*Kp to the joint-space inertia.  Includes:
    - PD drives (POS: Kp+Kd, VEL: Kd),
    - joint-limit spring-damper, gated on limit violation (state-dependent),
    - the joint-friction tanh linearized around 0 velocity.
    This makes all three unconditionally stable regardless of joint inertia
    (e.g. nv_ant's 0.02 kg m^2 ankles vs anymal's 0.5 kg m^2 hips).
    """
    mode = model.dof_drive_mode
    kp = jnp.where(mode == DRIVE_POS, model.dof_stiffness, 0.0)
    # damping is implicit in every mode: drive damping for POS/VEL, passive
    # joint damping for NONE/EFFORT (see passive_force)
    kd = model.dof_damping
    at_limit = model.dof_has_limit & (
        (dof_pos < model.dof_lower) | (dof_pos > model.dof_upper)
    )
    kp = kp + jnp.where(at_limit, _LIMIT_STIFFNESS, 0.0)
    kd = kd + jnp.where(at_limit, _LIMIT_DAMPING, 0.0)
    kd = kd + model.dof_friction / _FRICTION_VEL_EPS
    return h * kd + h * h * kp


_MAX_ROOT_ANGVEL = 64.0    # rad/s — PhysX asset default max_angular_velocity
_MAX_ROOT_LINVEL = 1000.0  # m/s  — PhysX asset default max_linear_velocity


def _clamp_root_vel(model: SimModel, qd):
    """Clamp free-root velocities at the PhysX per-body limits — the guard
    that bounds energy injection from pathological multi-contact states (an
    explicit penalty contact can otherwise pump a light body to overflow;
    PhysX bounds this inside its TGS solver)."""
    for b in range(model.nb):
        if model.jtype[b] != JT_FREE:
            continue
        va = model.v_adr[b]
        qd = qd.at[..., va : va + 3].set(
            jnp.clip(qd[..., va : va + 3], -_MAX_ROOT_ANGVEL, _MAX_ROOT_ANGVEL)
        )
        qd = qd.at[..., va + 3 : va + 6].set(
            jnp.clip(qd[..., va + 3 : va + 6], -_MAX_ROOT_LINVEL, _MAX_ROOT_LINVEL)
        )
    return qd


def _integrate(model: SimModel, q, qd_new, dt):
    """Semi-implicit Euler position update (free joints via quat exp map)."""
    q_new = q
    for b in range(model.nb):
        if model.jtype[b] != JT_FREE:
            continue
        qa, va = model.q_adr[b], model.v_adr[b]
        quat = q[..., qa + 3 : qa + 7]
        omega_b = qd_new[..., va : va + 3]
        v_b = qd_new[..., va + 3 : va + 6]
        omega_w = maths.quat_rotate(quat, omega_b)
        v_w = maths.quat_rotate(quat, v_b)
        q_new = q_new.at[..., qa : qa + 3].add(v_w * dt)
        q_new = q_new.at[..., qa + 3 : qa + 7].set(maths.quat_integrate(quat, omega_w, dt))
    if model.nd > 0:
        qi = jnp.array(model.dof_q_adr, dtype=jnp.int32)
        vi = jnp.array(model.dof_v_adr, dtype=jnp.int32)
        q_new = q_new.at[..., qi].add(qd_new[..., vi] * dt)
    return q_new


def _substep(model: SimModel, terrain, state: SimState, ctrl: Control, dt: float) -> SimState:
    kin = kinematics.fk(model, state.q, state.qd)
    ang_w, lin_w = kinematics.world_velocities(model, kin)
    body_pos_w = jnp.stack(kin.p_w, axis=-2)
    body_ang_w = jnp.stack(ang_w, axis=-2)
    body_lin_w = jnp.stack(lin_w, axis=-2)

    # --- contacts ---
    gb = list(model.geom_body)
    R_w = jnp.stack(kin.R_w, axis=-3)  # (..., nb, 3, 3)
    off_w = jnp.einsum("...nij,...nj->...ni", R_w[..., gb, :, :], jnp.broadcast_to(
        model.geom_offset, body_pos_w.shape[:-2] + (model.ng, 3)))
    geom_pos_w = body_pos_w[..., gb, :] + off_w
    geom_vel_w = body_lin_w[..., gb, :] + jnp.cross(body_ang_w[..., gb, :], off_w)
    # live per-body active-contact counts renormalize every contact's
    # stiffness/impulse budget (XLA CSEs the duplicated penetration queries)
    no_ground = bool(getattr(model, "no_ground", False))
    act_g = (
        jnp.zeros(geom_pos_w.shape[:-1], bool) if no_ground
        else contact_mod.ground_active(model, terrain, geom_pos_w)
    )
    act_p = contact_mod.pair_active(model, geom_pos_w, body_pos_w, R_w)
    act_s = (
        contact_mod.sdf_active(model, geom_pos_w, body_pos_w, R_w)
        if model.n_sdf else None
    )
    n_act = contact_mod.body_active_counts(
        model, act_g, act_p, geom_pos_w.shape[:-2], act_sdf=act_s
    )
    if no_ground:
        # scene guarantees no geom reaches the ground plane (model flag;
        # see SimModel.no_ground) — skip the whole ground pass
        zeros6 = jnp.zeros(body_pos_w.shape[:-1] + (6,), body_pos_w.dtype)
        f_ext, body_cf = zeros6, zeros6[..., :3]
        slip_g = state.slip_g
    else:
        f_ext, body_cf, slip_g = contact_mod.contact_forces(
            model, terrain, geom_pos_w, geom_vel_w, body_pos_w, h=dt,
            n_active=n_act, slip=state.slip_g,
            geom_ang_w=body_ang_w[..., gb, :],
        )
    slip_p = state.slip_p
    if model.n_pairs:
        f_pair, cf_pair, slip_p = contact_mod.pair_contact_forces(
            model, geom_pos_w, body_pos_w, R_w, body_lin_w, body_ang_w, h=dt,
            n_active=n_act, slip=state.slip_p,
        )
        f_ext = f_ext + f_pair
        body_cf = body_cf + cf_pair
    if model.n_sdf:
        f_sdf, cf_sdf = contact_mod.sdf_contact_forces(
            model, geom_pos_w, body_pos_w, R_w, body_lin_w, body_ang_w, h=dt,
            n_active=n_act,
        )
        f_ext = f_ext + f_sdf
        body_cf = body_cf + cf_sdf
    if model.anchor_body:
        f_ext = f_ext + contact_mod.anchor_forces(
            model, body_pos_w, R_w, body_lin_w, body_ang_w, h=dt
        )
    if model.body_gravcomp is not None:
        # per-body anti-gravity at the COM (disable_gravity equivalent)
        # gravity may be DR-batched (n, 3): align it on a body axis so it
        # broadcasts against the (n, nb, 1) per-body mass term
        f_g = jnp.broadcast_to(
            -(model.body_gravcomp * model.body_mass)[..., :, None]
            * model.gravity[..., None, :],
            body_pos_w.shape,
        )
        com_w = jnp.einsum("...nij,...nj->...ni", R_w, jnp.broadcast_to(
            model.body_com, body_pos_w.shape))
        f_ext = f_ext + jnp.concatenate([jnp.cross(com_w, f_g), f_g], axis=-1)

    if ctrl.body_wrench is not None:
        f_ext = f_ext + ctrl.body_wrench

    # --- joint forces ---
    dof_pos, dof_vel, qi, vi = _dof_arrays(model, state)
    tau_applied = actuation_force(model, dof_pos, dof_vel, ctrl)
    tau_passive = passive_force(model, dof_pos, dof_vel)
    tau = jnp.zeros_like(state.qd).at[..., vi].set(tau_applied + tau_passive)

    # --- forward dynamics: ABA with implicit spring-damper stabilization
    # on the joint-space diagonal (profiled 8x faster than CRBA+Cholesky on
    # TPU: no (N, nv, nv) assembly, no batched linalg).  Level-parallel
    # schedule: +19% step throughput on Anymal vs serial ABA (one stacked
    # kernel per tree depth instead of one per body; scripts/bench_aba_lp.py) ---
    d_imp = _implicit_drive_terms(model, dt, dof_pos) if model.nd > 0 else None
    if model.sensor_body:
        qdd, fj = dynamics.aba_lp(
            model, kin, tau, f_ext, d_extra=d_imp, return_joint_forces=True
        )
        sb = list(model.sensor_body)
        # sensor layout: [force3, torque3] in the body frame (ref:
        # acquire_force_sensor_tensor; fj rows are [n, f])
        joint_wrench = jnp.concatenate(
            [fj[..., sb, 3:], fj[..., sb, :3]], axis=-1
        )
    else:
        qdd = dynamics.aba_lp(model, kin, tau, f_ext, d_extra=d_imp)
        joint_wrench = None

    # --- integrate ---
    qd_new = state.qd + qdd * dt
    if model.nd > 0:
        dv = jnp.clip(qd_new[..., vi], -model.dof_maxvel, model.dof_maxvel)
        qd_new = qd_new.at[..., vi].set(dv)
    qd_new = _clamp_root_vel(model, qd_new)
    q_new = _integrate(model, state.q, qd_new, dt)

    # NOTE: body pose/velocity caches are NOT written per substep — `forward`
    # refreshes them once per control step (they'd be recomputed and thrown
    # away `substeps-1` times otherwise).  Contact/dof forces are kept from
    # the last substep, matching PhysX CC_LAST_SUBSTEP contact collection
    # (ref: cfg/task/Anymal.yaml contact_collection: 1).
    return state.replace(
        q=q_new,
        qd=qd_new,
        contact_force=body_cf,
        contact_torque=f_ext[..., :3] - (ctrl.body_wrench[..., :3] if ctrl.body_wrench is not None else 0.0),
        dof_force=tau_applied + tau_passive,
        joint_wrench=joint_wrench,
        # geom-less models keep slip None (scan carries need stable pytrees)
        slip_g=slip_g if model.ng else None,
        slip_p=slip_p,
    )


@maths.f32_matmul
def step(
    model: SimModel,
    terrain,
    state: SimState,
    ctrl: Control,
    dt: float,
    substeps: int = 2,
) -> SimState:
    """Advance the sim by one control period: `substeps` × (dt / substeps).

    Equivalent of `control_freq_inv × gym.simulate` with PhysX substeps
    (ref: vec_task.py:379-382 + sim params dt/substeps, cfg/task/*.yaml).
    Derived caches (body poses/vels/contact forces) reflect the *last*
    substep's FK — refreshed once more against q_new by `forward` if exact
    post-step poses are required; envs read them as the post-step state,
    matching the reference where refresh happens next step.
    """
    h = dt / substeps
    if model.sensor_body and state.joint_wrench is None:
        # normalize the carry pytree for states predating sensor declaration
        state = state.replace(
            joint_wrench=jnp.zeros(
                state.q.shape[:-1] + (len(model.sensor_body), 6), state.q.dtype
            )
        )
    # normalize stiction state (scan carries need a stable pytree structure;
    # zeros = "no anchor yet", re-anchored on the first active substep)
    if model.ng and state.slip_g is None:
        state = state.replace(
            slip_g=jnp.zeros(state.q.shape[:-1] + (model.ng, 3), state.q.dtype)
        )
    if model.n_pairs and state.slip_p is None:
        state = state.replace(
            slip_p=jnp.zeros(
                state.q.shape[:-1] + (model.n_pairs, 3), state.q.dtype
            )
        )
    fused_kind = _use_fused(model, terrain, ctrl, state)
    if fused_kind:
        # "mono": single fused Pallas kernel for the whole substep loop —
        # every FK/ABA/contact intermediate stays in VMEM (physics/fused.py).
        # "split": contacts + dynamics kernel pair for scenes whose live
        # register set exceeds the monolith's VMEM wall (fused_split.py).
        from isaacgymenv_tpu.physics import fused as fused_mod
        from isaacgymenv_tpu.physics import fused_split as split_mod

        n = state.q.shape[0]
        terrain_mode = terrain is not None
        wrench_mode = ctrl.body_wrench is not None
        fric_mode = jnp.ndim(model.geom_friction) == 2
        # DR-batched model leaves ride as kernel inputs (the fast path
        # survives domain randomization — VERDICT r1 item #5)
        mass_mode = (
            jnp.ndim(model.body_mass) == 2 or jnp.ndim(model.geom_meff) == 2
        )
        dof_mode = bool(model.nd) and any(
            jnp.ndim(x) == 2
            for x in (model.dof_stiffness, model.dof_damping,
                      model.dof_lower, model.dof_upper)
        )
        grav_mode = jnp.ndim(model.gravity) == 2
        builder = (
            fused_mod.build_fused_substep if fused_kind == "mono"
            else split_mod.build_split_substep
        )
        run = builder(
            model, h, substeps, n,
            interpret=jax.default_backend() not in ("tpu",),
            terrain_mode=terrain_mode, wrench_mode=wrench_mode,
            fric_mode=fric_mode, mass_mode=mass_mode, dof_mode=dof_mode,
            grav_mode=grav_mode,
        )
        nd = model.nd
        bc = lambda x: jnp.broadcast_to(x, (n, nd))
        extras = {}
        if terrain_mode:
            # per-geom ground height/normal sampled once per control step
            # at the current geom positions (see build_fused_substep doc)
            gb = list(model.geom_body)
            off = jnp.broadcast_to(model.geom_offset, (n, model.ng, 3))
            off_w = maths.quat_rotate(state.body_quat[:, gb], off)
            gpos = state.body_pos[:, gb] + off_w
            gx, gy = gpos[..., 0], gpos[..., 1]
            extras["ground_h"] = contact_mod.height_at(terrain, gx, gy)
            extras["ground_n"] = contact_mod.terrain_normal(terrain, gx, gy)
        if wrench_mode:
            extras["body_wrench"] = jnp.broadcast_to(
                ctrl.body_wrench, (n, model.nb, 6)
            )
        if fric_mode:
            extras["geom_fric"] = model.geom_friction
        if mass_mode:
            extras["body_mass"] = model.body_mass
            extras["geom_meff"] = model.geom_meff
        if dof_mode:
            extras["dof_kp"] = model.dof_stiffness
            extras["dof_kd"] = model.dof_damping
            extras["dof_lo"] = model.dof_lower
            extras["dof_hi"] = model.dof_upper
        if grav_mode:
            extras["gravity"] = model.gravity
        q_new, qd_new, dof_force, cf, ct, jw, slip_g, slip_p = run(
            state.q, state.qd, bc(ctrl.pos_target), bc(ctrl.vel_target),
            bc(ctrl.effort), slip_g=state.slip_g, slip_p=state.slip_p,
            **extras,
        )
        state = state.replace(
            q=q_new, qd=qd_new, dof_force=dof_force,
            contact_force=cf, contact_torque=ct, joint_wrench=jw,
            slip_g=slip_g, slip_p=slip_p,
        )
        return forward(model, terrain, state)
    if substeps == 1:
        state = _substep(model, terrain, state, ctrl, h)
    else:
        # scan keeps the traced graph one-substep-deep (fast compiles; XLA
        # still fuses the substep body into one loop kernel)
        def body(s, _):
            return _substep(model, terrain, s, ctrl, h), None

        state, _ = jax.lax.scan(body, state, None, length=substeps)
    return forward(model, terrain, state)


def _use_fused(model, terrain, ctrl, state):
    """Fast-path dispatch: "mono" | "split" | None (XLA path).

    The monolithic kernel wins when its live-register set fits VMEM; big
    scenes (ShadowHand's 256 contact pairs, UsefulHound's 21-body chain)
    take the split contacts+dynamics kernel pair instead of falling all
    the way back to the many-small-kernels XLA path."""
    # opt-out escape hatches; see physics/fused.py for the fast-path scope
    if os.environ.get("ISAACGYMENV_TPU_NO_FUSED", "") == "1":
        return None
    # the Mosaic kernel only wins on TPU; on the CPU backend pallas_call
    # falls back to the interpreter, which is ~400x SLOWER than the XLA
    # path (measured: Cartpole 128 envs, 229 vs 86k steps/s) and takes
    # minutes to trace.  FORCE_FUSED/FORCE_SPLIT bypass the backend guard
    # so the equivalence tests in tests/test_fused*.py can drive the
    # kernels in interpret mode on CPU (they'd otherwise compare XLA to
    # itself).
    force_mono = os.environ.get("ISAACGYMENV_TPU_FORCE_FUSED", "") == "1"
    force_split = os.environ.get("ISAACGYMENV_TPU_FORCE_SPLIT", "") == "1"
    if not (force_mono or force_split) and jax.default_backend() == "cpu":
        return None
    if state.q.ndim != 2:
        return None
    from isaacgymenv_tpu.physics import fused as fused_mod
    from isaacgymenv_tpu.physics import fused_split as split_mod

    n = state.q.shape[0]
    if not fused_mod.fused_structural_ok(model, terrain, ctrl.body_wrench, n):
        return None
    if force_split:
        return "split"
    if fused_mod.fused_ok(model, terrain, ctrl.body_wrench, n):
        return "mono"
    if (
        os.environ.get("ISAACGYMENV_TPU_NO_SPLIT", "") != "1"
        and split_mod.split_ok(model, n)
    ):
        return "split"
    return None


@maths.f32_matmul
def forward(model: SimModel, terrain, state: SimState) -> SimState:
    """Refresh derived caches from (q, qd) without advancing time.

    The functional analog of the reference's `gym.refresh_*_tensor` family
    plus `gym.fetch_results` (ref: tasks/anymal.py:257-261).
    """
    kin = kinematics.fk(model, state.q, state.qd)
    ang_w, lin_w = kinematics.world_velocities(model, kin)
    return state.replace(
        body_pos=jnp.stack(kin.p_w, axis=-2),
        body_quat=jnp.stack([maths.rotmat_to_quat(R) for R in kin.R_w], axis=-2),
        body_linvel=jnp.stack(lin_w, axis=-2),
        body_angvel=jnp.stack(ang_w, axis=-2),
    )
