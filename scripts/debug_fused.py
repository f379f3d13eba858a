"""Debug: localize fused-kernel vs engine mismatch (one substep)."""

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from isaacgymenv_tpu.physics import engine
from tests.test_fused import _quad_model, _rand_state, _empty_sim, N


def main():
    import os
    model = _quad_model()
    key = jax.random.PRNGKey(0)
    q0, qd0 = _rand_state(model, key)
    sim0 = _empty_sim(model, q0, qd0)
    ctrl = engine.Control.zero(model, N).replace(
        pos_target=0.4 * jax.random.normal(jax.random.fold_in(key, 1), (N, model.nd)),
        effort=5.0 * jax.random.normal(jax.random.fold_in(key, 2), (N, model.nd)),
    )
    dt = 0.02

    os.environ["ISAACGYMENV_TPU_NO_FUSED"] = "1"
    ref = engine.step(model, None, sim0, ctrl, dt, 1)
    os.environ["ISAACGYMENV_TPU_NO_FUSED"] = ""
    out = engine.step(model, None, sim0, ctrl, dt, 1)

    dq = np.abs(np.asarray(out.q) - np.asarray(ref.q))
    bad = dq.max(-1) > 2e-4
    print("bad envs:", bad.sum(), "/", N)
    q0n = np.asarray(q0)
    # limit violations at t0
    slider_over = np.abs(q0n[:, 9]) > 0.2
    hips_over = (np.abs(q0n[:, 7]) > 1.2) | (np.abs(q0n[:, 8]) > 1.2)
    print("slider over limit:", slider_over.sum(), "hips over:", hips_over.sum())
    print("bad & slider_over:", (bad & slider_over).sum())
    print("bad & ~slider_over & ~hips_over:", (bad & ~slider_over & ~hips_over).sum())
    i_bad = np.where(bad)[0][:5]
    i_good = np.where(~bad)[0][:3]
    for i in i_bad:
        print(f"env {i}: q0[7:]={q0n[i,7:]}, dq={dq[i].max():.2e} "
              f"argmax={dq[i].argmax()}")
    print("qd diff:", np.abs(np.asarray(out.qd) - np.asarray(ref.qd)).max(0))
    print("dof_force diff:", np.abs(np.asarray(out.dof_force) - np.asarray(ref.dof_force)).max(0))
    print("cf diff:", np.abs(np.asarray(out.contact_force) - np.asarray(ref.contact_force)).max())


if __name__ == "__main__":
    main()
