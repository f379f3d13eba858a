"""Retargeting pipeline tests (ref: poselib skeleton3d.py retarget_to)."""

import numpy as np

from isaacgymenv_tpu.utils.retarget import (
    Pose,
    Skeleton,
    load_motion,
    retarget_motion,
    save_motion,
)


def _chain_skeleton(names=("root", "mid", "tip")):
    return Skeleton(
        node_names=list(names),
        parents=np.array([-1, 0, 1]),
        local_translation=np.array([[0, 0, 0], [0, 0, 0.5], [0, 0, 0.4]]),
    )


def _aa(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([axis * np.sin(angle / 2), [np.cos(angle / 2)]])


def _tpose(skel):
    J = len(skel.node_names)
    r = np.tile([0.0, 0.0, 0.0, 1.0], (J, 1))
    return Pose(skel, r, np.zeros(3))


def _random_motion(skel, F=5, seed=0):
    rng = np.random.default_rng(seed)
    J = len(skel.node_names)
    r = rng.normal(size=(F, J, 4))
    r /= np.linalg.norm(r, axis=-1, keepdims=True)
    t = rng.normal(size=(F, 3))
    return Pose(skel, r, t)


def test_identity_retarget_reproduces_motion():
    skel = _chain_skeleton()
    motion = _random_motion(skel)
    mapping = {n: n for n in skel.node_names}
    out = retarget_motion(motion, _tpose(skel), _tpose(skel), mapping)
    # same skeleton + identity tposes -> global rotations preserved
    np.testing.assert_allclose(
        out.global_rotation() * np.sign(out.global_rotation()[..., 3:4]),
        motion.global_rotation() * np.sign(motion.global_rotation()[..., 3:4]),
        atol=1e-8,
    )
    np.testing.assert_allclose(out.root_translation, motion.root_translation, atol=1e-12)


def test_alignment_rotation_and_scale():
    skel = _chain_skeleton()
    motion = _random_motion(skel, F=3, seed=1)
    mapping = {n: n for n in skel.node_names}
    rot = _aa([0, 0, 1], np.pi / 2)
    out = retarget_motion(
        motion, _tpose(skel), _tpose(skel), mapping,
        rotation_to_target=rot, scale_to_target=0.5, root_height_offset=0.1,
    )
    # root translation rotated 90deg about z, halved, z-offset
    t = motion.root_translation
    expect = 0.5 * np.stack([-t[:, 1], t[:, 0], t[:, 2]], -1)
    expect[:, 2] += 0.1
    np.testing.assert_allclose(out.root_translation, expect, atol=1e-8)


def test_unmapped_joint_inherits_ancestor():
    src = _chain_skeleton(("root", "mid", "tip"))
    tgt = Skeleton(
        node_names=["root", "mid", "extra", "tip"],
        parents=np.array([-1, 0, 1, 2]),
        local_translation=np.array([[0, 0, 0], [0, 0, 0.5], [0, 0, 0.2], [0, 0, 0.2]]),
    )
    motion = _random_motion(src, F=2, seed=2)
    mapping = {"root": "root", "mid": "mid", "tip": "tip"}
    out = retarget_motion(motion, _tpose(src), _tpose(tgt), mapping)
    g = out.global_rotation()
    # 'extra' (unmapped) inherits its mapped ancestor 'mid'
    np.testing.assert_allclose(g[:, 2], g[:, 1], atol=1e-8)


def test_save_and_load_roundtrip(tmp_path):
    skel = _chain_skeleton()
    motion = _random_motion(skel, F=4, seed=3)
    path = str(tmp_path / "m.npy")
    save_motion(motion, fps=30, path=path)
    loaded, fps = load_motion(path)
    assert fps == 30
    np.testing.assert_allclose(
        loaded.local_rotation, motion.local_rotation, atol=1e-6
    )
    d = np.load(path, allow_pickle=True).item()
    assert "global_velocity" in d and d["rotation"]["arr"].shape == (4, 3, 4)
