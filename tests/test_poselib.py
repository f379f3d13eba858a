"""Standalone poselib API (utils/poselib.py) vs the reference npy schema
and the MotionLib runtime loader."""

import os

import numpy as np
import pytest

from isaacgymenv_tpu.utils.config import asset_root
from isaacgymenv_tpu.utils.motion_lib import MotionLib
from isaacgymenv_tpu.utils.poselib import SkeletonMotion, SkeletonState, SkeletonTree

MOTION = os.path.join("amp", "motions", "amp_humanoid_walk.npy")
KEY_BODIES = ["right_hand", "left_hand", "right_foot", "left_foot"]


def _motion_path():
    p = os.path.join(asset_root(), MOTION)
    if not os.path.exists(p):
        pytest.skip(f"motion asset missing: {p}")
    return p


def test_from_file_matches_motionlib_fk():
    path = _motion_path()
    m = SkeletonMotion.from_file(path)
    assert m.num_frames > 0 and m.fps > 0
    assert m.rotation.shape == (m.num_frames, m.num_joints, 4)

    lib = MotionLib(path, num_dofs=28, key_body_names=KEY_BODIES)
    F = m.num_frames
    # FK parity: root + key-body world positions
    np.testing.assert_allclose(
        m.global_translation[:, 0], np.asarray(lib.data.root_pos[0, :F]),
        atol=1e-5,
    )
    key_ids = [m.skeleton_tree.index(n) for n in KEY_BODIES]
    np.testing.assert_allclose(
        m.global_translation[:, key_ids], np.asarray(lib.data.key_pos[0, :F]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        m.global_root_rotation, np.asarray(lib.data.root_rot[0, :F]), atol=1e-5
    )
    # dof conversion parity
    assert m.dof_positions(28).shape == (F, 28)


def test_roundtrip_file_loads_in_motionlib(tmp_path):
    path = _motion_path()
    m = SkeletonMotion.from_file(path)
    out = os.path.join(tmp_path, "roundtrip.npy")
    m.to_file(out)
    m2 = SkeletonMotion.from_file(out)
    np.testing.assert_allclose(m2.rotation, m.rotation)
    np.testing.assert_allclose(m2.root_translation, m.root_translation)
    assert m2.fps == m.fps
    assert m2.skeleton_tree.node_names == m.skeleton_tree.node_names
    # the runtime loader consumes the written file
    lib = MotionLib(out, num_dofs=28, key_body_names=KEY_BODIES)
    assert int(lib.data.num_frames[0]) == m.num_frames


def test_state_fk_and_velocities():
    path = _motion_path()
    m = SkeletonMotion.from_file(path)
    # stored velocities were produced by the reference's smoothed pipeline;
    # the derivation now replicates it (sigma=2 gaussian, zero final angular
    # frame), so mid-trajectory agreement should be tight
    fresh = m.__class__(m.skeleton_tree, m.rotation, m.root_translation, m.fps)
    raw = np.load(path, allow_pickle=True).item()
    for attr, key in [
        ("global_velocity", "global_velocity"),
        ("global_angular_velocity", "global_angular_velocity"),
    ]:
        got = getattr(fresh, attr)
        stored = raw[key]["arr"]
        err = np.abs(got[5:-5] - stored[5:-5]).mean()
        scale = np.abs(stored).mean() + 1e-6
        assert err / scale < 0.12, f"{key} mismatch: {err} vs scale {scale}"

    # single-frame state FK
    st = SkeletonState.from_rotation_and_root_translation(
        m.skeleton_tree, m.rotation[0], m.root_translation[0], is_local=True
    )
    np.testing.assert_allclose(st.global_translation, m.global_translation[0],
                               atol=1e-5)


def test_global_representation_state_fk():
    """A state holding GLOBAL rotations supports FK queries (ADVICE r2)."""
    path = _motion_path()
    m = SkeletonMotion.from_file(path)
    gstate = SkeletonState.from_rotation_and_root_translation(
        m.skeleton_tree, m.global_rotation[0], m.root_translation[0],
        is_local=False,
    )
    np.testing.assert_allclose(
        gstate.global_translation, m.global_translation[0], atol=1e-5
    )
    np.testing.assert_allclose(
        gstate.global_rotation, m.global_rotation[0], atol=1e-6
    )
    # local_rotation inverts the recursion back to the stored local quats
    lrot = gstate.local_rotation
    ref = m.rotation[0]
    # quats are sign-ambiguous: compare up to sign per joint
    sign = np.sign(np.sum(lrot * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(lrot * sign, ref, atol=1e-5)


def test_tree_from_mjcf():
    mjcf = os.path.join(asset_root(), "mjcf", "amp_humanoid.xml")
    if not os.path.exists(mjcf):
        pytest.skip("amp_humanoid.xml missing")
    tree = SkeletonTree.from_mjcf(mjcf)
    assert tree.num_joints >= 10
    assert tree.parent_indices[0] == -1
    assert "pelvis" in tree.node_names
    # serialization roundtrip
    t2 = SkeletonTree.from_dict(tree.to_dict())
    assert t2.node_names == tree.node_names
    np.testing.assert_allclose(t2.local_translation, tree.local_translation)
