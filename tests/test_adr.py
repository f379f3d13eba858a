"""Tensorized ADR engine: sampling semantics and range adaptation."""

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenv_tpu.utils.adr import ADR, BOUNDARY, ROLLOUT


def _adr(n=64, q=8):
    cfg = {
        "worker_adr_boundary_fraction": 0.5,
        "adr_queue_threshold_length": q,
        "adr_objective_threshold_low": 5.0,
        "adr_objective_threshold_high": 20.0,
        "params": {
            "noise": {"init_range": [0.0, 0.1], "limits": [0.0, 1.0], "delta": 0.05},
            "latency": {"init_range": [0.0, 0.0], "limits": [0.0, 10.0], "delta": 0.5},
        },
    }
    return ADR(cfg, n)


def test_sampling_respects_ranges_and_boundaries():
    adr = _adr()
    st = adr.init_state(jax.random.PRNGKey(0))
    vals = np.asarray(st.values)
    types = np.asarray(st.worker_types)
    modes = np.asarray(st.adr_modes)
    ranges = np.asarray(st.ranges)
    # rollout workers sample inside ranges
    for p in range(adr.P):
        sel = (types == ROLLOUT)
        assert (vals[sel, p] >= ranges[p, 0] - 1e-6).all()
        assert (vals[sel, p] <= ranges[p, 1] + 1e-6).all()
    # boundary workers pinned at their mode's edge
    for i in np.nonzero(types == BOUNDARY)[0]:
        p, b = modes[i] // 2, modes[i] % 2
        assert abs(vals[i, p] - ranges[p, b]) < 1e-6


def test_ranges_expand_on_good_boundary_performance():
    adr = _adr(n=64, q=4)
    st = adr.init_state(jax.random.PRNGKey(0))
    # force all envs to be upper-boundary workers of param 0
    st = st.replace(
        worker_types=jnp.full(64, BOUNDARY, jnp.int32),
        adr_modes=jnp.full(64, 1, jnp.int32),  # param 0 upper
    )
    hi0 = float(st.ranges[0, 1])
    done = jnp.ones(64, bool)
    objective = jnp.full(64, 30.0)  # above threshold_high -> expand
    st = adr.update(st, done, objective)
    assert float(st.ranges[0, 1]) > hi0
    # queue consumed
    assert int(st.queue_count[1]) == 0
    # boundary workers of that mode demoted to rollout
    assert (np.asarray(st.worker_types) == ROLLOUT).all()


def test_ranges_shrink_on_poor_boundary_performance():
    adr = _adr(n=64, q=4)
    st = adr.init_state(jax.random.PRNGKey(0))
    st = st.replace(
        worker_types=jnp.full(64, BOUNDARY, jnp.int32),
        adr_modes=jnp.full(64, 1, jnp.int32),
        ranges=jnp.array([[0.0, 0.5], [0.0, 0.0]]),
    )
    st = adr.update(st, jnp.ones(64, bool), jnp.full(64, 1.0))  # poor perf
    # upper bound pulled back toward init (0.1)
    assert float(st.ranges[0, 1]) < 0.5
    # never below the init upper bound
    for _ in range(20):
        st = st.replace(
            worker_types=jnp.full(64, BOUNDARY, jnp.int32),
            adr_modes=jnp.full(64, 1, jnp.int32),
        )
        st = adr.update(st, jnp.ones(64, bool), jnp.full(64, 1.0))
    assert float(st.ranges[0, 1]) >= 0.1 - 1e-6


def test_adr_update_is_jittable():
    adr = _adr()
    st = adr.init_state(jax.random.PRNGKey(0))
    f = jax.jit(lambda s, d, o: adr.on_reset(jax.random.PRNGKey(1), s, d, o))
    st2 = f(st, jnp.ones(64, bool), jnp.zeros(64))
    assert np.isfinite(np.asarray(st2.ranges)).all()


def test_dextreme_dict_obs_surface_and_adr_env_state_roundtrip():
    """The DeXtreme dict-obs surface exposes every per-key buffer incl. the
    `*_randomized` duplicates (ref: adr_vec_task.py:143-220), and the ADR
    env-state dict round-trips through get/set_env_state keyed like the
    reference checkpoint (ref: adr_vec_task.py:368-399)."""
    import jax.numpy as jnp

    from isaacgymenv_tpu.api import make

    env = make(seed=0, task="AllegroHandDextremeADR", num_envs=4)
    task = env.task
    env.reset()
    obs, rew, done, ex = env.step(jnp.zeros((4, 16)))
    assert "obs_dict" in obs
    dims = task.obs_dims
    for k, d in dims.items():
        assert k in obs["obs_dict"], f"missing dict-obs key {k}"
        assert obs["obs_dict"][k].shape == (4, d), (k, obs["obs_dict"][k].shape)
    # noised duplicates present and (generically) different from the raw key
    assert "dof_pos_randomized" in obs["obs_dict"]

    # ADR env-state roundtrip
    st = env.state
    d = task.get_env_state(st)
    assert set(d["adr_params"]) == set(task.adr.names)
    import numpy as np

    d2 = {k: (v.copy() if hasattr(v, "copy") else v) for k, v in d.items()}
    name0 = task.adr.names[0]
    d2["adr_params"] = dict(d["adr_params"])
    d2["adr_params"][name0] = {"range": [0.123, 0.456]}
    st2 = task.set_env_state(st, d2)
    back = task.get_env_state(st2)
    np.testing.assert_allclose(back["adr_params"][name0]["range"], [0.123, 0.456])
    # untouched params keep their ranges
    for n in task.adr.names[1:]:
        np.testing.assert_allclose(
            back["adr_params"][n]["range"], d["adr_params"][n]["range"]
        )
