"""Split fused substep: contacts kernel + dynamics kernel for big scenes.

The monolithic fused kernel (physics/fused.py) holds the ENTIRE substep's
intermediates live in VMEM registers.  Mosaic's measured stack demand runs
~2.2x the live-register estimate (docs/perf.md "VMEM calibration"), so
scenes past ~7 MB of estimated registers (ShadowHand: 256 contact pairs;
UsefulHound: 21-body articulation) fail to lower and fell back to the
~13x slower XLA path.

This module splits the substep at its natural seam — the external-force
vector — into two Pallas kernels with bounded register sets:

- **contacts kernel**: FK -> ground/pair/anchor contacts + gravity comp ->
  f_ext (world, per body).  Pair contacts are ROLLED: a `fori_loop` over
  the pair list reads per-pair params from SMEM tables, body state from a
  VMEM scratch array (dynamic indexing), and scatter-accumulates forces
  into the per-body output refs — live registers stay O(1) in n_pairs
  (the monolith's unrolled pair pass costs ~8 live registers PER pair).
- **dynamics kernel**: FK (recomputed — cheaper than shipping 36*nb rows
  through HBM) -> actuation/passive/tendon forces -> ABA -> semi-implicit
  integration.

The substep loop runs OUTSIDE the kernels: per substep one contacts +
one dynamics launch, chained through HBM in the same SoA layout
((row, S, 128) tiles, envs on lanes).  Per-substep HBM traffic is
~(nq+nv+12*nb) rows — a few hundred KB per 1024 envs, negligible against
the XLA path's hundreds of small-kernel round trips.

Dispatch: `engine._use_fused` prefers the monolith when it fits VMEM and
falls back here for big-register scenes; numerical equivalence vs the XLA
engine is tested in tests/test_fused_split.py.

ref: VERDICT r4 item #2 (ShadowHand off the fused path); docs/perf.md
"ShadowHand and the fused-path VMEM boundary".
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
from isaacgymenv_tpu.physics.engine import (  # noqa: E402
    _FRICTION_VEL_EPS,
    _LIMIT_DAMPING,
    _LIMIT_STIFFNESS,
    _MAX_ROOT_ANGVEL,
    _MAX_ROOT_LINVEL,
)
from isaacgymenv_tpu.physics.fused import (
    LANES,
    _chol_solve6,
    _crf,
    _crm,
    _cross,
    _frc_to_parent,
    _inertia_to_parent,
    _mmul,
    _mot_to_child,
    _mTvec,
    _mvec,
    _quat_to_R,
    _rodrigues_static,
    _spatial_inertia_const,
    _vadd,
    _vsub,
)

# float-table slots for the rolled pair loop (one row per pair, SMEM)
_PF_RG = 0        # geom radius
_PF_MG = 1        # geom effective mass (static mode)
_PF_MGEL = 2      # geom elastic effective mass
_PF_MS = 3        # surface effective mass
_PF_MSEL = 4      # surface elastic effective mass
_PF_MU_S = 5      # surface friction (for fric_mode sqrt)
_PF_MU = 6        # sqrt(geom_mu * surf_mu) precombined (static mode)
_PF_OFF = 7       # 7..9  surface offset (local)
_PF_SIZE = 10     # 10..12 surface size
_PF_ROTM = 13     # 13..21 surface rotation (row major)
_PF_GOFF = 22     # 22..24 geom offset (local)
_PF_N = 25

# int-table slots
_PI_G = 0         # geom index (for fric/mass dynamic inputs)
_PI_GB = 1        # geom body
_PI_SB = 2        # surface body
_PI_KIND = 3      # surface kind (0 sphere / 1 box / 2 capsule / 3 cylinder)
_PI_N = 4

# per-body row width in the bstate scratch: R_w(9) p_w(3) ang_w(3) lin_w(3)
_BS_W = 18


def _block_s(num_envs: int) -> int:
    """Sublane block: the minimum fp32 tile height (8) when divisible, else
    the whole array (grid=1) — the same Mosaic constraint as the monolith."""
    if num_envs % (8 * LANES) == 0:
        return 8
    return num_envs // LANES


def split_vmem_est(model: SimModel, num_envs: int):
    """(S, contacts_bytes, dynamics_bytes) Mosaic demand estimates.

    Calibrated against the monolith's measurements (docs/perf.md): demand
    ~= 2.2 x live-register estimate + explicit scratch + 2 x block IO
    (pipeline double buffering).  Registers here are (S,128) fp32 tiles."""
    nb, nq, nv, nd, ng = model.nb, model.nq, model.nv, model.nd, model.ng
    n_pairs = model.n_pairs
    S = _block_s(num_envs)
    tile = S * LANES * 4
    use_ground = not model.no_ground

    # contacts kernel: FK live set + unrolled ground caches + rolled-loop
    # locals (O(1) in n_pairs) + misc
    c_regs = 20 * nb + (7 * ng if use_ground else 3 * ng) + 120 + nq + nv + 200
    c_scratch = (_BS_W * nb + nb) if n_pairs else 0
    c_io = (
        nq + nv + 12 * nb
        + (3 * ng if use_ground else 0) + 3 * n_pairs
        + (4 * ng if use_ground else 0)  # terrain h+n upper bound
    )
    contacts = int(2.2 * c_regs * tile + c_scratch * tile + 2 * c_io * tile)

    # dynamics kernel: FK + ABA live set (IA 36 + pA/c_b/U ~20 per body)
    d_regs = 56 * nb + 2 * (nq + nv + 2 * nd) + 300
    d_io = 2 * nq + 2 * nv + 3 * nd + 6 * nb + nd + 6 * len(model.sensor_body)
    dynamics = int(2.2 * d_regs * tile + 2 * d_io * tile)
    return S, contacts, dynamics


def split_ok(model: SimModel, num_envs: int) -> bool:
    """True when the split path's two kernels both fit the VMEM budget.

    Structural eligibility (joint types, static pair params, ...) is the
    caller's job via fused.fused_structural_ok — this only checks size."""
    import os

    budget = int(os.environ.get(
        "ISAACGYMENV_TPU_SPLIT_VMEM_BUDGET", 15 * 1024 * 1024
    ))
    if num_envs % LANES != 0:
        return False
    _, c_b, d_b = split_vmem_est(model, num_envs)
    return c_b <= budget and d_b <= budget


# ---------------------------------------------------------------------------
# shared FK trace (identical math to fused.py's FK block)
# ---------------------------------------------------------------------------


def _trace_fk(model_c, q, qd, zero):
    """Unrolled FK: returns (R_l, p_l, R_w, p_w, v, vJ) python lists."""
    (nb, jtype, parent, q_adr, v_adr, R_tree_c, joint_pos_c, joint_axis_c) = model_c
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
    return R_l, p_l, R_w, p_w, v, vJ


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------


def build_split_substep(
    model: SimModel, dt: float, substeps: int, num_envs: int,
    interpret: bool = False, terrain_mode: bool = False,
    wrench_mode: bool = False, fric_mode: bool = False,
    mass_mode: bool = False, dof_mode: bool = False, grav_mode: bool = False,
):
    """Same contract as fused.build_fused_substep (run signature/returns),
    implemented as substeps x (contacts kernel -> dynamics kernel)."""
    nb, nq, nv, nd, ng = model.nb, model.nq, model.nv, model.nd, model.ng
    S = _block_s(num_envs)
    use_ground = not model.no_ground
    grid = num_envs // (S * LANES)
    h = float(dt)
    n_pairs = model.n_pairs
    ns = len(model.sensor_body)

    # ---- static model constants (same leaf discipline as the monolith:
    # leaves covered by an input mode are never read at build time)
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
    model_c = (nb, jtype, parent, q_adr, v_adr, R_tree_c, joint_pos_c,
               joint_axis_c)
    if mass_mode:
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
        geom_meff_el = geom_meff
    kn_c = float(np.asarray(model.contact_stiffness))
    kd_c = float(np.asarray(model.contact_damping))
    kt_c = float(np.asarray(model.tangential_stiffness))
    sensors = list(model.sensor_body)

    anchors = list(model.anchor_body)
    if anchors:
        anchor_off_c = np.asarray(model.anchor_offset, np.float64)
        anchor_tgt_c = np.asarray(model.anchor_target, np.float64)
        anchor_meff_c = np.asarray(model.anchor_meff, np.float64)
    gravcomp_c = (
        np.asarray(model.body_gravcomp, np.float64)
        if model.body_gravcomp is not None else None
    )
    body_com_c = np.asarray(model.body_com, np.float64)
    body_mass_c = None if mass_mode else np.asarray(model.body_mass, np.float64)
    tendons = list(model.tendon_dof)
    if tendons:
        tendon_coef_c = np.asarray(model.tendon_coef, np.float64)
        tendon_rng_c = np.asarray(model.tendon_range, np.float64)
        tendon_k_c = np.asarray(model.tendon_k, np.float64)
        tendon_d_c = np.asarray(model.tendon_d, np.float64)

    # ---- pair tables for the rolled loop (host-built, tiny)
    if n_pairs:
        surf_off_c = np.asarray(model.surf_offset, np.float64)
        surf_rotm_c = np.asarray(model.surf_rotm, np.float64)
        surf_size_c = np.asarray(model.surf_size, np.float64)
        surf_mu_c = np.asarray(model.surf_friction, np.float64)
        surf_meff_c = np.asarray(model.surf_meff, np.float64)
        surf_meff_el_c = (
            np.asarray(model.surf_meff_el, np.float64)
            if model.surf_meff_el is not None else surf_meff_c
        )
        pint = np.zeros((n_pairs, _PI_N), np.int32)
        pflt = np.zeros((n_pairs, _PF_N), np.float32)
        for pi in range(n_pairs):
            g = int(model.pair_geom[pi])
            s_ = int(model.pair_surf[pi])
            pint[pi, _PI_G] = g
            pint[pi, _PI_GB] = int(geom_body[g])
            pint[pi, _PI_SB] = int(model.surf_body[s_])
            pint[pi, _PI_KIND] = int(model.surf_kind[s_])
            pflt[pi, _PF_RG] = geom_r[g]
            if not mass_mode:
                pflt[pi, _PF_MG] = geom_meff[g]
            if _el_static or not mass_mode:
                pflt[pi, _PF_MGEL] = geom_meff_el[g]
            pflt[pi, _PF_MS] = surf_meff_c[s_]
            pflt[pi, _PF_MSEL] = surf_meff_el_c[s_]
            pflt[pi, _PF_MU_S] = surf_mu_c[s_]
            if not fric_mode:
                pflt[pi, _PF_MU] = np.sqrt(geom_mu[g] * surf_mu_c[s_])
            pflt[pi, _PF_OFF:_PF_OFF + 3] = surf_off_c[s_]
            pflt[pi, _PF_SIZE:_PF_SIZE + 3] = surf_size_c[s_]
            pflt[pi, _PF_ROTM:_PF_ROTM + 9] = surf_rotm_c[s_].reshape(9)
            pflt[pi, _PF_GOFF:_PF_GOFF + 3] = geom_off[g]
        pint_arr = jnp.asarray(pint)
        pflt_arr = jnp.asarray(pflt)

    # -----------------------------------------------------------------
    # contacts kernel
    # -----------------------------------------------------------------

    def contacts_kernel(*refs):
        it = iter(refs)
        q_ref, qd_ref = next(it), next(it)
        gh_ref = next(it) if terrain_mode else None
        gn_ref = next(it) if terrain_mode else None
        bw_ref = next(it) if wrench_mode else None
        fr_ref = next(it) if fric_mode else None
        bm_ref = next(it) if mass_mode else None
        me_ref = next(it) if mass_mode else None
        gv_ref = next(it) if grav_mode else None
        pint_ref = next(it) if n_pairs else None
        pflt_ref = next(it) if n_pairs else None
        sg_ref = next(it) if (ng and use_ground) else None
        sp_ref = next(it) if n_pairs else None
        fx_ref, cf_ref, ct_ref = next(it), next(it), next(it)
        sgo_ref = next(it) if (ng and use_ground) else None
        spo_ref = next(it) if n_pairs else None
        bstate_ref = next(it) if n_pairs else None   # scratch (nb*18,S,L)
        nact_ref = next(it)                          # scratch (nb,S,L)

        q = [q_ref[i] for i in range(nq)]
        qd = [qd_ref[i] for i in range(nv)]
        zero = jnp.zeros_like(q_ref[0])

        R_l, p_l, R_w, p_w, v, vJ = _trace_fk(model_c, q, qd, zero)

        # world-frame body velocities (cached once; the monolith's
        # body_vel_w cache equivalent) + geom world offsets
        ang_w = [None] * nb
        lin_w = [None] * nb
        for b in range(nb):
            ang_w[b] = _mvec(R_w[b], v[b][:3])
            lin_w[b] = _mvec(R_w[b], v[b][3:])
        geom_off_w = {}
        for g in range(ng):
            b = geom_body[g]
            geom_off_w[g] = _mvec(R_w[b], tuple(float(x) for x in geom_off[g]))

        # zero the accumulators
        for b in range(nb):
            nact_ref[b] = zero
            for k in range(6):
                fx_ref[b * 6 + k] = zero
            for k in range(3):
                cf_ref[b * 3 + k] = zero
                ct_ref[b * 3 + k] = zero

        def _b2f(x):
            return x.astype(jnp.float32) if hasattr(x, "astype") else jnp.float32(x)

        # PASS 1 (ground, unrolled): depth + active counts
        ground_cache = []
        if use_ground:
            for g in range(ng):
                b = geom_body[g]
                off_w = geom_off_w[g]
                pos_z = p_w[b][2] + off_w[2]
                hgt = gh_ref[g] if terrain_mode else 0.0
                depth = hgt + float(geom_r[g]) - pos_z
                active = depth > 0.0
                nact_ref[b] = nact_ref[b] + _b2f(active)
                ground_cache.append((g, b, depth, active))

        if n_pairs:
            # stage body state into scratch for dynamic indexing
            for b in range(nb):
                base = b * _BS_W
                for r in range(3):
                    for c in range(3):
                        bstate_ref[base + 3 * r + c] = R_w[b][r][c] + zero
                for k in range(3):
                    bstate_ref[base + 9 + k] = p_w[b][k] + zero
                    bstate_ref[base + 12 + k] = ang_w[b][k] + zero
                    bstate_ref[base + 15 + k] = lin_w[b][k] + zero

            def pair_query(pi):
                """Rolled surface query: returns (g, gb, sb, depth, n_w, c).

                All per-pair params come from the SMEM tables; body state
                from the bstate scratch (dynamic rows).  All four surface
                kinds are evaluated and selected by the traced kind — the
                monolith selects the branch at trace time instead, but a
                rolled loop has one body for every pair."""
                g = pint_ref[pi, _PI_G]
                gb = pint_ref[pi, _PI_GB]
                sb = pint_ref[pi, _PI_SB]
                kind = pint_ref[pi, _PI_KIND]
                bs_g = bstate_ref[pl.ds(gb * _BS_W, _BS_W)]
                bs_s = bstate_ref[pl.ds(sb * _BS_W, _BS_W)]
                Rg = tuple(tuple(bs_g[3 * r + c] for c in range(3)) for r in range(3))
                Rs_b = tuple(tuple(bs_s[3 * r + c] for c in range(3)) for r in range(3))
                p_g = tuple(bs_g[9 + k] for k in range(3))
                p_s_b = tuple(bs_s[9 + k] for k in range(3))
                goff = tuple(pflt_ref[pi, _PF_GOFF + k] for k in range(3))
                c = _vadd(p_g, _mvec(Rg, goff))
                Rm = tuple(
                    tuple(pflt_ref[pi, _PF_ROTM + 3 * r + cc] for cc in range(3))
                    for r in range(3)
                )
                R_s = _mmul(Rs_b, Rm)
                soff = _mvec(
                    Rs_b, tuple(pflt_ref[pi, _PF_OFF + k] for k in range(3))
                )
                p_s = _vadd(p_s_b, soff)
                local = _mTvec(R_s, _vsub(c, p_s))
                sz = tuple(pflt_ref[pi, _PF_SIZE + k] for k in range(3))
                eps = 1e-9
                # sphere
                dist_c = jnp.sqrt(local[0] ** 2 + local[1] ** 2 + local[2] ** 2)
                inv = 1.0 / jnp.maximum(dist_c, eps)
                n_sph = tuple(local[k] * inv for k in range(3))
                d_sph = dist_c - sz[0]
                # box
                qv = tuple(jnp.clip(local[k], -sz[k], sz[k]) for k in range(3))
                delta = _vsub(local, qv)
                dist_out = jnp.sqrt(delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2)
                invb = 1.0 / jnp.maximum(dist_out, eps)
                n_out = tuple(delta[k] * invb for k in range(3))
                face = tuple(sz[k] - jnp.abs(local[k]) for k in range(3))
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
                n_box = tuple(jnp.where(inside, n_in[k], n_out[k]) for k in range(3))
                d_box = jnp.where(inside, d_in, dist_out)
                # capsule [R, half_len], axis local z
                seg_z = jnp.clip(local[2], -sz[1], sz[1])
                d_vec = (local[0], local[1], local[2] - seg_z)
                dist_seg = jnp.sqrt(d_vec[0] ** 2 + d_vec[1] ** 2 + d_vec[2] ** 2)
                invc = 1.0 / jnp.maximum(dist_seg, eps)
                n_cap = tuple(d_vec[k] * invc for k in range(3))
                d_cap = dist_seg - sz[0]
                # capped cylinder [R, half_len]
                rho = jnp.sqrt(local[0] ** 2 + local[1] ** 2)
                inv_rho = 1.0 / jnp.maximum(rho, eps)
                rdir = (local[0] * inv_rho, local[1] * inv_rho)
                dr = rho - sz[0]
                dz = jnp.abs(local[2]) - sz[1]
                out_r = jnp.maximum(dr, 0.0)
                out_z = jnp.maximum(dz, 0.0)
                d_out = jnp.sqrt(out_r * out_r + out_z * out_z)
                d_in_cyl = jnp.maximum(dr, dz)
                d_cyl = jnp.where(d_in_cyl < 0, d_in_cyl, d_out)
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
                n_cyl = tuple(
                    jnp.where(d_in_cyl < 0, n_in3[k], n_out3[k]) for k in range(3)
                )
                # select by kind
                is0, is1, is2 = kind == 0, kind == 1, kind == 2
                d_surf = jnp.where(
                    is0, d_sph, jnp.where(is1, d_box, jnp.where(is2, d_cap, d_cyl))
                )
                n_l = tuple(
                    jnp.where(
                        is0, n_sph[k],
                        jnp.where(is1, n_box[k], jnp.where(is2, n_cap[k], n_cyl[k])),
                    )
                    for k in range(3)
                )
                n_w = _mvec(R_s, n_l)
                depth = pflt_ref[pi, _PF_RG] - d_surf
                return g, gb, sb, depth, n_w, c

            # PASS 1 (pairs, rolled): active counts only
            def p1_body(pi, _):
                _, gb, sb, depth, _, _ = pair_query(pi)
                act = _b2f(depth > 0.0)
                nact_ref[pl.ds(gb, 1)] = nact_ref[pl.ds(gb, 1)] + act[None]
                nact_ref[pl.ds(sb, 1)] = nact_ref[pl.ds(sb, 1)] + act[None]
                return 0

            jax.lax.fori_loop(0, n_pairs, p1_body, 0)

        # PASS 2 (ground, unrolled): forces with renormalized budgets
        if use_ground:
            for g, b, depth, active in ground_cache:
                off_w = geom_off_w[g]
                aw, lw = ang_w[b], lin_w[b]
                if terrain_mode:
                    n_g = (gn_ref[3 * g], gn_ref[3 * g + 1], gn_ref[3 * g + 2])
                else:
                    n_g = (0.0, 0.0, 1.0)
                r_g = float(geom_r[g])
                lever = tuple(off_w[k] - r_g * n_g[k] for k in range(3))
                vel = _vadd(lw, _cross(aw, lever))
                share = 1.0 / jnp.maximum(nact_ref[b], 1.0)
                meff_g = (me_ref[g] if mass_mode else float(geom_meff[g])) * share
                arrest = 0.25 * meff_g / h
                arrest_n = 1.0 * meff_g / h
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
                f_damp = jnp.minimum(kd_c * d_pos, arrest_n) * (-v_n)
                fn = jnp.where(
                    active, jnp.maximum(kn_eff * d_pos + f_damp, 0.0), 0.0
                )
                mu = fr_ref[g] if fric_mode else float(geom_mu[g])
                kt_el = jnp.minimum(kt_c, meff_g / (h * h))
                ct_ = jnp.minimum(arrest, kt_c)
                s = (sg_ref[3 * g], sg_ref[3 * g + 1], sg_ref[3 * g + 2])
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
                for k in range(3):
                    sgo_ref[3 * g + k] = jnp.where(
                        active,
                        jnp.where(clamp, -f_t[k] * inv_kt, s[k]),
                        0.0,
                    )
                f_w = tuple(
                    fn * n_g[k] + jnp.where(active, f_t[k], 0.0)
                    for k in range(3)
                )
                torque = _cross(lever, f_w)
                for k in range(3):
                    fx_ref[b * 6 + k] = fx_ref[b * 6 + k] + torque[k]
                    fx_ref[b * 6 + 3 + k] = fx_ref[b * 6 + 3 + k] + f_w[k]
                    cf_ref[b * 3 + k] = cf_ref[b * 3 + k] + f_w[k]

        if n_pairs:
            # PASS 2 (pairs, rolled): forces + slip update, scattered into
            # the per-body refs.  The surface query is re-derived — in a
            # rolled loop the recompute costs one loop body, not n_pairs
            # live caches (the monolith's slim-mode CSE problem does not
            # apply: there is only one pass-2 trace).
            def p2_body(pi, _):
                g, gb, sb, depth, n_w, c = pair_query(pi)
                active = depth > 0.0
                bs_g = bstate_ref[pl.ds(gb * _BS_W, _BS_W)]
                bs_s = bstate_ref[pl.ds(sb * _BS_W, _BS_W)]
                p_g = tuple(bs_g[9 + k] for k in range(3))
                p_s_b = tuple(bs_s[9 + k] for k in range(3))
                ag = tuple(bs_g[12 + k] for k in range(3))
                lg = tuple(bs_g[15 + k] for k in range(3))
                as_ = tuple(bs_s[12 + k] for k in range(3))
                ls = tuple(bs_s[15 + k] for k in range(3))
                r_g = pflt_ref[pi, _PF_RG]
                x_c = tuple(c[k] - n_w[k] * r_g for k in range(3))
                lever_g = _vsub(x_c, p_g)
                lever_s = _vsub(x_c, p_s_b)
                v_g = _vadd(lg, _cross(ag, lever_g))
                v_s = _vadd(ls, _cross(as_, lever_s))
                v_rel = _vsub(v_g, v_s)
                v_n = v_rel[0] * n_w[0] + v_rel[1] * n_w[1] + v_rel[2] * n_w[2]
                v_t = tuple(v_rel[k] - v_n * n_w[k] for k in range(3))
                share_g = 1.0 / jnp.maximum(nact_ref[pl.ds(gb, 1)][0], 1.0)
                share_s = 1.0 / jnp.maximum(nact_ref[pl.ds(sb, 1)][0], 1.0)
                if mass_mode:
                    m_g_ = me_ref[pl.ds(g, 1)][0] * share_g
                else:
                    m_g_ = pflt_ref[pi, _PF_MG] * share_g
                m_s_ = pflt_ref[pi, _PF_MS] * share_s
                m_pair = m_g_ * m_s_ / (m_g_ + m_s_)
                arrest = 0.25 * m_pair / h
                arrest_n = 1.0 * m_pair / h
                ms_el = pflt_ref[pi, _PF_MSEL] * share_s
                if _el_static or not mass_mode:
                    mg_el = pflt_ref[pi, _PF_MGEL] * share_g
                else:
                    mg_el = m_g_
                kn_eff = jnp.minimum(
                    kn_c, mg_el * ms_el / (mg_el + ms_el) / (h * h)
                )
                d_pos = jnp.minimum(jnp.maximum(depth, 0.0), 0.05)
                f_damp = jnp.minimum(kd_c * d_pos, arrest_n) * (-v_n)
                fn = jnp.where(
                    active, jnp.maximum(kn_eff * d_pos + f_damp, 0.0), 0.0
                )
                if fric_mode:
                    mu = jnp.sqrt(
                        fr_ref[pl.ds(g, 1)][0] * pflt_ref[pi, _PF_MU_S]
                    )
                else:
                    mu = pflt_ref[pi, _PF_MU]
                kt_el = jnp.minimum(kt_c, m_pair / (h * h))
                ct_ = jnp.minimum(arrest, kt_c)
                sp = sp_ref[pl.ds(3 * pi, 3)]
                s = tuple(sp[k] + v_t[k] * h for k in range(3))
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
                s_new = jnp.stack([
                    jnp.where(
                        active,
                        jnp.where(clamp, -f_t[k] * inv_kt, s[k]),
                        0.0,
                    )
                    for k in range(3)
                ])
                spo_ref[pl.ds(3 * pi, 3)] = s_new
                f_p = tuple(
                    fn * n_w[k] + jnp.where(active, f_t[k], 0.0)
                    for k in range(3)
                )
                tq_g = _cross(lever_g, f_p)
                f_n = tuple(-f_p[k] for k in range(3))
                tq_s = _cross(lever_s, f_n)
                fx_ref[pl.ds(gb * 6, 6)] = fx_ref[pl.ds(gb * 6, 6)] + jnp.stack(
                    list(tq_g) + list(f_p)
                )
                fx_ref[pl.ds(sb * 6, 6)] = fx_ref[pl.ds(sb * 6, 6)] + jnp.stack(
                    list(tq_s) + list(f_n)
                )
                cf_ref[pl.ds(gb * 3, 3)] = cf_ref[pl.ds(gb * 3, 3)] + jnp.stack(
                    list(f_p)
                )
                cf_ref[pl.ds(sb * 3, 3)] = cf_ref[pl.ds(sb * 3, 3)] + jnp.stack(
                    list(f_n)
                )
                return 0

            jax.lax.fori_loop(0, n_pairs, p2_body, 0)

        # world anchors (unrolled; contact.anchor_forces parity)
        for ai, ab in enumerate(anchors):
            off_a = _mvec(R_w[ab], tuple(float(x) for x in anchor_off_c[ai]))
            p_a = _vadd(p_w[ab], off_a)
            aw, lw = ang_w[ab], lin_w[ab]
            v_a = _vadd(lw, _cross(aw, off_a))
            m_a = float(anchor_meff_c[ai])
            kp_a = 0.2 * m_a / (h * h)
            kd_a = 0.7 * m_a / h
            a_tgt = tuple(float(x) for x in anchor_tgt_c[ai])
            f_a = tuple(
                -kp_a * (p_a[k] - a_tgt[k]) - kd_a * v_a[k] for k in range(3)
            )
            tq_a = _cross(off_a, f_a)
            for k in range(3):
                fx_ref[ab * 6 + k] = fx_ref[ab * 6 + k] + tq_a[k]
                fx_ref[ab * 6 + 3 + k] = fx_ref[ab * 6 + 3 + k] + f_a[k]

        # per-body gravity compensation
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
                for k in range(3):
                    fx_ref[b * 6 + k] = fx_ref[b * 6 + k] + tq_g[k]
                    fx_ref[b * 6 + 3 + k] = fx_ref[b * 6 + 3 + k] + f_g[k]

        # engine parity: contact_torque = TOTAL external moment before the
        # commanded wrench
        for b in range(nb):
            for k in range(3):
                ct_ref[b * 3 + k] = fx_ref[b * 6 + k] + zero
        if wrench_mode:
            for b in range(nb):
                for k in range(6):
                    fx_ref[b * 6 + k] = fx_ref[b * 6 + k] + bw_ref[b * 6 + k]

    # -----------------------------------------------------------------
    # dynamics kernel
    # -----------------------------------------------------------------

    def dynamics_kernel(*refs):
        it = iter(refs)
        q_ref, qd_ref, tgt_ref, vtgt_ref, eff_ref, fx_ref = (
            next(it) for _ in range(6)
        )
        bm_ref = next(it) if mass_mode else None
        kp_ref = next(it) if dof_mode else None
        kd_ref = next(it) if dof_mode else None
        lo_ref = next(it) if dof_mode else None
        hi_ref = next(it) if dof_mode else None
        gv_ref = next(it) if grav_mode else None
        qo_ref, qdo_ref, dfo_ref = (next(it) for _ in range(3))
        jw_ref = next(it) if ns else None

        q = [q_ref[i] for i in range(nq)]
        qd = [qd_ref[i] for i in range(nv)]
        tgt = [tgt_ref[i] for i in range(nd)]
        vtgt = [vtgt_ref[i] for i in range(nd)]
        eff = [eff_ref[i] for i in range(nd)]
        zero = jnp.zeros_like(q_ref[0])

        R_l, p_l, R_w, p_w, v, vJ = _trace_fk(model_c, q, qd, zero)
        f_ext = [tuple(fx_ref[b * 6 + k] for k in range(6)) for b in range(nb)]

        # joint forces + implicit diagonal (identical to the monolith)
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

        # ABA (identical to the monolith)
        IA = [None] * nb
        pA = [None] * nb
        c_b = [None] * nb
        for i in range(nb):
            if mass_mode:
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

        jw = []
        for b in sensors:
            fj = tuple(
                sum(IA[b][r][k] * a_b[b][k] for k in range(6)) + pA[b][r]
                for r in range(6)
            )
            jw.append(fj[3:] + fj[:3])

        # integrate (identical to the monolith)
        qd_new = [qd[k] + qdd[k] * h for k in range(nv)]
        for d in range(nd):
            va = v_adr[d_body[d]]
            mv = float(d_maxvel[d])
            qd_new[va] = jnp.clip(qd_new[va], -mv, mv)
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

        for i in range(nq):
            qo_ref[i] = q_new[i]
        for i in range(nv):
            qdo_ref[i] = qd_new[i]
        for d in range(nd):
            dfo_ref[d] = tau_d[d]
        for s_i in range(ns):
            for k in range(6):
                jw_ref[s_i * 6 + k] = jw[s_i][k] + zero

    # -----------------------------------------------------------------
    # pallas_call assembly
    # -----------------------------------------------------------------

    def spec(d):
        return pl.BlockSpec(
            (d, S, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    def smem_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM
        )

    shape = lambda d: jax.ShapeDtypeStruct(
        (d, num_envs // LANES, LANES), jnp.float32
    )

    slip_g_io = bool(ng) and use_ground

    # contacts call
    c_in = [spec(nq), spec(nv)]
    if terrain_mode:
        c_in += [spec(ng), spec(ng * 3)]
    if wrench_mode:
        c_in.append(spec(nb * 6))
    if fric_mode:
        c_in.append(spec(ng))
    if mass_mode:
        c_in += [spec(nb), spec(ng)]
    if grav_mode:
        c_in.append(spec(3))
    if n_pairs:
        c_in += [smem_spec((n_pairs, _PI_N)), smem_spec((n_pairs, _PF_N))]
    c_out = [spec(nb * 6), spec(nb * 3), spec(nb * 3)]
    c_oshape = [shape(nb * 6), shape(nb * 3), shape(nb * 3)]
    c_alias = {}
    if slip_g_io:
        c_alias[len(c_in)] = len(c_out)
        c_in.append(spec(ng * 3))
        c_out.append(spec(ng * 3))
        c_oshape.append(shape(ng * 3))
    if n_pairs:
        c_alias[len(c_in)] = len(c_out)
        c_in.append(spec(n_pairs * 3))
        c_out.append(spec(n_pairs * 3))
        c_oshape.append(shape(n_pairs * 3))
    c_scratch = []
    if n_pairs:
        c_scratch.append(pltpu.VMEM((nb * _BS_W, S, LANES), jnp.float32))
    c_scratch.append(pltpu.VMEM((nb, S, LANES), jnp.float32))

    contacts_call = pl.pallas_call(
        contacts_kernel,
        grid=(grid,),
        in_specs=c_in,
        out_specs=c_out,
        out_shape=c_oshape,
        scratch_shapes=c_scratch,
        input_output_aliases=c_alias,
        interpret=interpret,
    )

    # dynamics call
    d_in = [spec(nq), spec(nv), spec(nd), spec(nd), spec(nd), spec(nb * 6)]
    if mass_mode:
        d_in.append(spec(nb))
    if dof_mode:
        d_in += [spec(nd), spec(nd), spec(nd), spec(nd)]
    if grav_mode:
        d_in.append(spec(3))
    d_out = [spec(nq), spec(nv), spec(nd)]
    d_oshape = [shape(nq), shape(nv), shape(nd)]
    if ns:
        d_out.append(spec(ns * 6))
        d_oshape.append(shape(ns * 6))

    dynamics_call = pl.pallas_call(
        dynamics_kernel,
        grid=(grid,),
        in_specs=d_in,
        out_specs=d_out,
        out_shape=d_oshape,
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )

    def to_soa(x, d):
        return jnp.moveaxis(x, -1, 0).reshape(d, num_envs // LANES, LANES)

    def from_soa(x):
        d = x.shape[0]
        return jnp.moveaxis(x.reshape(d, num_envs), 0, -1)

    def run(q, qd, pos_target, vel_target, effort,
            ground_h=None, ground_n=None, body_wrench=None, geom_fric=None,
            body_mass=None, geom_meff=None, dof_kp=None, dof_kd=None,
            dof_lo=None, dof_hi=None, gravity=None,
            slip_g=None, slip_p=None):
        f32 = jnp.float32
        bcast = lambda x, d: to_soa(
            jnp.broadcast_to(x, (num_envs, d)).astype(f32), d
        )
        qs = to_soa(q.astype(f32), nq)
        qds = to_soa(qd.astype(f32), nv)
        tgt = to_soa(pos_target.astype(f32), nd)
        vtgt = to_soa(vel_target.astype(f32), nd)
        eff = to_soa(effort.astype(f32), nd)

        c_extra = []
        if terrain_mode:
            c_extra.append(to_soa(ground_h.astype(f32), ng))
            c_extra.append(
                to_soa(ground_n.reshape(num_envs, ng * 3).astype(f32), ng * 3)
            )
        if wrench_mode:
            c_extra.append(
                to_soa(body_wrench.reshape(num_envs, nb * 6).astype(f32), nb * 6)
            )
        if fric_mode:
            c_extra.append(bcast(geom_fric, ng))
        if mass_mode:
            c_extra.append(bcast(body_mass, nb))
            c_extra.append(bcast(geom_meff, ng))
        if grav_mode:
            c_extra.append(bcast(gravity, 3))
        if n_pairs:
            c_extra += [pint_arr, pflt_arr]

        d_extra_args = []
        if mass_mode:
            d_extra_args.append(bcast(body_mass, nb))
        if dof_mode:
            d_extra_args.append(bcast(dof_kp, nd))
            d_extra_args.append(bcast(dof_kd, nd))
            d_extra_args.append(bcast(dof_lo, nd))
            d_extra_args.append(bcast(dof_hi, nd))
        if grav_mode:
            d_extra_args.append(bcast(gravity, 3))

        if slip_g_io:
            if slip_g is None:
                slip_g = jnp.zeros((num_envs, ng, 3), f32)
            sg = to_soa(slip_g.reshape(num_envs, ng * 3).astype(f32), ng * 3)
        if n_pairs:
            if slip_p is None:
                slip_p = jnp.zeros((num_envs, n_pairs, 3), f32)
            sp = to_soa(
                slip_p.reshape(num_envs, n_pairs * 3).astype(f32), n_pairs * 3
            )

        dof_force = cf = ct = jw_soa = None
        for _ in range(substeps):
            c_args = [qs, qds] + c_extra
            if slip_g_io:
                c_args.append(sg)
            if n_pairs:
                c_args.append(sp)
            c_outs = contacts_call(*c_args)
            fext, cf, ct = c_outs[0], c_outs[1], c_outs[2]
            o = 3
            if slip_g_io:
                sg = c_outs[o]
                o += 1
            if n_pairs:
                sp = c_outs[o]
            d_outs = dynamics_call(qs, qds, tgt, vtgt, eff, fext, *d_extra_args)
            qs, qds, dof_force = d_outs[0], d_outs[1], d_outs[2]
            if ns:
                jw_soa = d_outs[3]

        q_new = from_soa(qs)
        qd_new = from_soa(qds)
        dof_force = from_soa(dof_force)
        cf_out = from_soa(cf).reshape(num_envs, nb, 3)
        ct_out = from_soa(ct).reshape(num_envs, nb, 3)
        jw = from_soa(jw_soa).reshape(num_envs, ns, 6) if ns else None
        slip_g_new = slip_p_new = None
        if slip_g_io:
            slip_g_new = from_soa(sg).reshape(num_envs, ng, 3)
        elif ng:
            slip_g_new = (
                slip_g if slip_g is not None
                else jnp.zeros((num_envs, ng, 3), f32)
            )
        if n_pairs:
            slip_p_new = from_soa(sp).reshape(num_envs, n_pairs, 3)
        return (q_new, qd_new, dof_force, cf_out, ct_out, jw,
                slip_g_new, slip_p_new)

    return run
