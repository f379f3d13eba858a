"""Component-level TPU profiling of the physics step (Anymal, 4096 envs).

Times FK, contact, CRBA, bias, Cholesky-solve, and the full substep
separately to locate the bottleneck.  Run on the TPU backend.
"""

import time

import jax
import jax.numpy as jnp

from isaacgymenv_tpu.envs import registry
from isaacgymenv_tpu.physics import contact as cmod
from isaacgymenv_tpu.physics import dynamics, engine, kinematics
from isaacgymenv_tpu.utils.config import load_task_config

N = 4096
REPS = 50


def timeit(name, fn, *args):
    # WARNING: identical independent calls can be memoized by the axon relay
    # and block_until_ready is async there — numbers are only trustworthy on
    # the local CPU/TPU backends; prefer scripts/roofline.py on the relay.
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:24s} {dt*1e3:8.3f} ms  ({N/dt/1e6:7.2f} M env-substeps/s)")
    return out


def main():
    cfg = load_task_config("Anymal", num_envs=N)
    env = registry.get_task("Anymal")(cfg)
    m = env.model
    state = env.initial_state(jax.random.PRNGKey(0))
    sim = state.sim
    print(f"devices: {jax.devices()}  nb={m.nb} nv={m.nv} ng={m.ng}")

    q, qd = sim.q, sim.qd

    @jax.jit
    def f_fk(q, qd):
        kin = kinematics.fk(m, q, qd)
        return kin.p_w[-1], kin.v[-1]

    @jax.jit
    def f_fk_contact(q, qd):
        kin = kinematics.fk(m, q, qd)
        ang_w, lin_w = kinematics.world_velocities(m, kin)
        bp = jnp.stack(kin.p_w, -2)
        ba = jnp.stack(ang_w, -2)
        bl = jnp.stack(lin_w, -2)
        gb = list(m.geom_body)
        Rw = jnp.stack(kin.R_w, -3)
        off_w = jnp.einsum(
            "...nij,...nj->...ni",
            Rw[..., gb, :, :],
            jnp.broadcast_to(m.geom_offset, bp.shape[:-2] + (m.ng, 3)),
        )
        gpos = bp[..., gb, :] + off_w
        gvel = bl[..., gb, :] + jnp.cross(ba[..., gb, :], off_w)
        return cmod.contact_forces(m, None, gpos, gvel, bp, h=2.5e-3)[0]

    @jax.jit
    def f_crba(q, qd):
        kin = kinematics.fk(m, q, qd)
        inertias = dynamics.body_spatial_inertias(m, q.shape[:-1], q.dtype)
        return dynamics.crba(m, kin, inertias)

    @jax.jit
    def f_bias(q, qd):
        kin = kinematics.fk(m, q, qd)
        inertias = dynamics.body_spatial_inertias(m, q.shape[:-1], q.dtype)
        return dynamics.rnea_bias(m, kin, inertias, None)

    M = f_crba(q, qd)

    @jax.jit
    def f_chol(M, qd):
        L = jnp.linalg.cholesky(M)
        y = jax.scipy.linalg.solve_triangular(L, qd[..., None], lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False
        )[..., 0]

    @jax.jit
    def f_linsolve(M, qd):
        return jnp.linalg.solve(M, qd[..., None])[..., 0]

    ctrl = engine.Control.zero(m, N).replace(
        pos_target=jnp.tile(env.default_dof_pos, (N, 1))
    )

    @jax.jit
    def f_substep(s):
        return engine._substep(m, None, s, ctrl, 2.5e-3)

    @jax.jit
    def f_step(s):
        return engine.step(m, None, s, ctrl, 0.02, 8)

    timeit("fk", f_fk, q, qd)
    timeit("fk+contact", f_fk_contact, q, qd)
    timeit("fk+crba", f_crba, q, qd)
    timeit("fk+bias", f_bias, q, qd)
    timeit("cholesky_solve", f_chol, M, qd)
    timeit("linsolve", f_linsolve, M, qd)
    timeit("full substep", f_substep, sim)
    out = timeit("full control step (x8)", f_step, sim)


if __name__ == "__main__":
    main()
