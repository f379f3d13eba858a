"""Mocap retargeting: map a SkeletonMotion onto a different skeleton.

Numpy port of the reference's poselib retarget pipeline
(ref: tasks/amp/poselib/poselib/skeleton/skeleton3d.py:814-976 `retarget_to`
+ retarget_motion.py:281): align the source with a global rotation, scale
the root translation, transfer per-joint global-rotation deltas (state
relative to t-pose) onto the target t-pose, and inherit the nearest mapped
ancestor's rotation for unmapped target joints.  Output is a
poselib-schema SkeletonMotion dict loadable by utils/motion_lib.py.

The FBX importer is NOT ported (needs the Autodesk FBX SDK, absent from
this image); sources must already be SkeletonMotion `.npy` files.

Quaternions are xyzw throughout (poselib convention).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


# ---------------------------------------------------------------------------
# quaternion helpers (numpy, xyzw)
# ---------------------------------------------------------------------------


def _qmul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def _qinv(q):
    out = -q.copy()
    out[..., 3] = q[..., 3]
    return out


def _qnorm(q):
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _qrot(q, v):
    u = q[..., :3]
    w = q[..., 3:4]
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


# ---------------------------------------------------------------------------
# skeleton containers (poselib npy schema)
# ---------------------------------------------------------------------------


@dataclass
class Skeleton:
    node_names: List[str]
    parents: np.ndarray           # (J,)
    local_translation: np.ndarray  # (J, 3)

    def index(self, name: str) -> int:
        return self.node_names.index(name)


@dataclass
class Pose:
    """local_rotation (..., J, 4), root_translation (..., 3)."""

    skeleton: Skeleton
    local_rotation: np.ndarray
    root_translation: np.ndarray

    def global_rotation(self) -> np.ndarray:
        J = len(self.skeleton.node_names)
        g = np.empty_like(self.local_rotation)
        for j in range(J):
            p = self.skeleton.parents[j]
            g[..., j, :] = (
                self.local_rotation[..., j, :]
                if p < 0
                else _qnorm(_qmul(g[..., p, :], self.local_rotation[..., j, :]))
            )
        return g

    def global_translation(self) -> np.ndarray:
        g = self.global_rotation()
        J = len(self.skeleton.node_names)
        t = np.empty(self.local_rotation.shape[:-2] + (J, 3))
        for j in range(J):
            p = self.skeleton.parents[j]
            if p < 0:
                t[..., j, :] = self.root_translation
            else:
                t[..., j, :] = t[..., p, :] + _qrot(
                    g[..., p, :],
                    np.broadcast_to(
                        self.skeleton.local_translation[j], t[..., j, :].shape
                    ),
                )
        return t

    @classmethod
    def from_global(cls, skeleton: Skeleton, global_rotation, root_translation):
        """global -> local rotations: l_j = inv(g_parent) * g_j (ref
        SkeletonState.local_repr)."""
        J = len(skeleton.node_names)
        local = np.empty_like(global_rotation)
        for j in range(J):
            p = skeleton.parents[j]
            local[..., j, :] = (
                global_rotation[..., j, :]
                if p < 0
                else _qnorm(
                    _qmul(_qinv(global_rotation[..., p, :]), global_rotation[..., j, :])
                )
            )
        return cls(skeleton, local, root_translation)


def _unwrap(d):
    return d["arr"] if isinstance(d, dict) and "arr" in d else d


def _load_dict(path) -> dict:
    return np.load(path, allow_pickle=True).item()


def load_skeleton(tree_dict: dict) -> Skeleton:
    return Skeleton(
        node_names=list(tree_dict["node_names"]),
        parents=np.asarray(_unwrap(tree_dict["parent_indices"])),
        local_translation=np.asarray(_unwrap(tree_dict["local_translation"]), np.float64),
    )


def load_pose(path) -> Pose:
    """Load a SkeletonState npy (t-pose files, e.g. data/amp_humanoid_tpose.npy)."""
    d = _load_dict(path)
    return Pose(
        load_skeleton(d["skeleton_tree"]),
        np.asarray(_unwrap(d["rotation"]), np.float64),
        np.asarray(_unwrap(d["root_translation"]), np.float64),
    )


def load_motion(path):
    """Load a SkeletonMotion npy -> (Pose with (F, J, 4) rotations, fps)."""
    d = _load_dict(path)
    pose = Pose(
        load_skeleton(d["skeleton_tree"]),
        np.asarray(_unwrap(d["rotation"]), np.float64),
        np.asarray(_unwrap(d["root_translation"]), np.float64),
    )
    fps = int(d.get("fps", 30))
    return pose, fps


# ---------------------------------------------------------------------------
# retarget
# ---------------------------------------------------------------------------


def retarget_motion(
    motion: Pose,
    source_tpose: Pose,
    target_tpose: Pose,
    joint_mapping: Dict[str, str],
    rotation_to_target: Optional[np.ndarray] = None,
    scale_to_target: float = 1.0,
    root_height_offset: float = 0.0,
) -> Pose:
    """Retarget `motion` (frames on the source skeleton) onto the target.

    Mirrors skeleton3d.py:880-976: STEP 2 root alignment rotation, STEP 3
    scaled root-translation delta, STEP 4 per-joint global-rotation delta
    re-applied to the target t-pose, unmapped target joints inheriting the
    nearest mapped ancestor's retargeted rotation, STEP 6 ground offset.
    """
    rot = (
        np.asarray(rotation_to_target, np.float64)
        if rotation_to_target is not None
        else np.array([0.0, 0.0, 0.0, 1.0])
    )
    src = motion.skeleton
    tgt = target_tpose.skeleton

    def aligned(pose: Pose) -> Pose:
        lr = pose.local_rotation.copy()
        lr[..., 0, :] = _qnorm(_qmul(rot, lr[..., 0, :]))
        return Pose(pose.skeleton, lr, _qrot(rot, pose.root_translation))

    state = aligned(motion)
    stpose = aligned(source_tpose)

    g_state = state.global_rotation()        # (F, Js, 4)
    g_stpose = stpose.global_rotation()      # (Js, 4)
    g_ttpose = target_tpose.global_rotation()  # (Jt, 4)

    # per-source-joint delta vs tpose (STEP 4)
    diff = _qnorm(_qmul(g_state, _qinv(g_stpose)))

    mapped_tgt = {joint_mapping[s]: s for s in joint_mapping}
    F = g_state.shape[0]
    Jt = len(tgt.node_names)
    g_new = np.zeros((F, Jt, 4))
    for tj, tname in enumerate(tgt.node_names):
        name = tname
        # inherit the nearest mapped ancestor (ref :960-966)
        while name not in mapped_tgt:
            p = tgt.parents[tgt.index(name)]
            if p < 0:
                break
            name = tgt.node_names[p]
        sname = mapped_tgt.get(name)
        if sname is None:
            g_new[:, tj] = np.array([0.0, 0.0, 0.0, 1.0])
            continue
        sj = src.index(sname)
        g_new[:, tj] = _qnorm(_qmul(diff[:, sj], g_ttpose[tgt.index(name)]))

    # STEP 3+5: scaled root translation delta on the target tpose root
    root_t = (
        target_tpose.root_translation
        + (state.root_translation - stpose.root_translation) * scale_to_target
    )
    root_t = root_t.copy()
    root_t[..., 2] += root_height_offset

    return Pose.from_global(tgt, g_new, root_t)


def save_motion(pose: Pose, fps: int, path: str) -> None:
    """Serialize a retargeted Pose to the poselib SkeletonMotion npy schema
    (global velocities from finite differences, as fbx_importer does)."""
    g_t = pose.global_translation()  # (F, J, 3)
    g_r = pose.global_rotation()
    F = g_t.shape[0]
    gvel = np.gradient(g_t, axis=0) * fps
    # angular velocity from frame-to-frame quat delta
    dq = _qmul(g_r[1:], _qinv(g_r[:-1]))
    angle = 2.0 * np.arctan2(np.linalg.norm(dq[..., :3], axis=-1), np.abs(dq[..., 3]))
    axis = dq[..., :3] * np.sign(dq[..., 3:4])
    axis = axis / np.maximum(np.linalg.norm(axis, axis=-1, keepdims=True), 1e-9)
    gang = np.concatenate([axis * angle[..., None] * fps, np.zeros((1,) + g_r.shape[1:-1] + (3,))], 0)

    d = {
        "rotation": {"arr": pose.local_rotation.astype(np.float32)},
        "root_translation": {"arr": pose.root_translation.astype(np.float32)},
        "global_velocity": {"arr": gvel.astype(np.float32)},
        "global_angular_velocity": {"arr": gang.astype(np.float32)},
        "fps": fps,
        "is_local": True,
        "skeleton_tree": {
            "node_names": list(pose.skeleton.node_names),
            "parent_indices": {"arr": pose.skeleton.parents},
            "local_translation": {"arr": pose.skeleton.local_translation.astype(np.float32)},
        },
        "__name__": "SkeletonMotion",
    }
    np.save(path, d)
