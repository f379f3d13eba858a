"""Object-dimension DR (DexPBT) + DeXtreme actor-scale DR (VERDICT r4 #4).

- AllegroKuka: per-env cuboid family (generate_cuboids.py parity), batched
  geometry leaves, real object_scales in the obs, scaled keypoints.
- AllegroHandDextreme: setup-only hand/object scale DR, real
  cube_random_params/hand_random_params obs values.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from isaacgymenv_tpu.api import make
from isaacgymenv_tpu.envs.allegro_kuka import cuboid_scale_families


def test_cuboid_scale_families_parity():
    """Family sizes/filters replicate generate_cuboids.py semantics."""
    default_only = cuboid_scale_families(False, False, False)
    assert default_only == [(1.0, 1.0, 1.0)]
    fams = cuboid_scale_families(True, True, True)
    # default cube present, all volumes within the family bounds
    assert (1.0, 1.0, 1.0) in fams
    vols = [x * y * z for x, y, z in fams]
    assert min(vols) >= 1.0 - 1e-9 and max(vols) <= 15.0 + 1e-9
    # thin plates excluded from the big family (vol > 2.5)
    for sc in fams:
        s = sorted(sc)
        if s[0] * s[1] * s[2] > 2.5:
            assert not (s[0] * 3 <= s[1]), f"thin plate survived: {sc}"
    # filename-collision dedup: the default cube appears exactly once (the
    # small family's identical 000_cube_100_100_100 file overwrites it);
    # same-triple different-filename entries from other families survive,
    # matching the reference's generated-directory listing
    assert fams.count((1.0, 1.0, 1.0)) == 1


def test_allegro_kuka_object_dim_dr_steps():
    env = make(seed=0, task="AllegroKukaReorientation", num_envs=6)
    t = env.task
    # per-env scales cycle through the family
    assert t.object_scales.shape == (6, 3)
    assert not np.allclose(t.object_scales, t.object_scales[0])
    # geometry leaves are DR-batched
    assert jnp.ndim(t.model.surf_size) == 3
    assert jnp.ndim(t.model.geom_radius) == 2
    assert jnp.ndim(t.model.body_mass) == 2
    # keypoints scale per env
    assert t.kp_offsets.shape[0] == 6
    obs = env.reset()
    for _ in range(3):
        obs, rew, done, _ = env.step(jnp.zeros((6, env.num_actions)))
    assert bool(jnp.isfinite(obs["obs"]).all())
    # the obs carry the real per-env scales at the documented offset
    # (obs layout: ... kp_rel_palm, kp_rel_goal, object_scales(3), ...)
    flat = np.asarray(obs["obs"])
    # locate by value: each env's scale triple appears in its obs row
    for i in range(6):
        sc = t.object_scales[i]
        row = flat[i]
        found = any(
            np.allclose(row[j : j + 3], np.clip(sc, -t.clamp_abs_obs, t.clamp_abs_obs), atol=1e-5)
            for j in range(row.size - 2)
        )
        assert found, f"env {i} scales {sc} not in obs"


def test_allegro_kuka_disable_randomization():
    env = make(
        seed=0, task="AllegroKukaReorientation", num_envs=4,
        **{"env.randomizeObjectDimensions": False},
    )
    t = env.task
    assert np.allclose(t.object_scales, 1.0)
    assert jnp.ndim(t.model.surf_size) == 2  # static leaves, fused-eligible


def test_dextreme_scale_dr_params_channel():
    env = make(seed=3, task="AllegroHandDextremeManualDR", num_envs=4)
    t = env.task
    # object scale drawn per env from the cfg range (setup-only)
    assert not np.allclose(t.object_scale_dr, 1.0)
    assert t.object_scale_dr.min() >= 0.95 - 1e-6
    assert t.object_scale_dr.max() <= 1.05 + 1e-6
    obs = env.reset()
    obs, rew, done, _ = env.step(jnp.zeros((4, env.num_actions)))
    d = obs["obs_dict"]
    crp = np.asarray(d["cube_random_params"])
    assert crp.shape == (4, 3)
    # col 0 = the drawn scales; col 1 = per-env object mass (DR-batched);
    # col 2 = per-env object friction
    assert np.allclose(crp[:, 0], t.object_scale_dr, atol=1e-5)
    assert (crp[:, 1] > 0).all() and (crp[:, 2] > 0).all()
    assert bool(jnp.isfinite(obs["obs"]).all())


def test_dextreme_adr_hand_scale():
    env = make(seed=5, task="AllegroHandDextremeADR", num_envs=4)
    t = env.task
    assert not np.allclose(t.hand_scale_dr, 1.0)  # ADR cfg randomizes hand scale
    assert jnp.ndim(t.model.joint_pos) == 3  # batched link offsets
    obs = env.reset()
    obs, rew, done, _ = env.step(jnp.zeros((4, env.num_actions)))
    hrp = np.asarray(obs["obs_dict"]["hand_random_params"])
    assert np.allclose(hrp[:, 0], t.hand_scale_dr, atol=1e-5)
