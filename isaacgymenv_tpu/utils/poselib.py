"""Standalone skeleton/motion API — the poselib surface the mocap tooling
uses (ref: tasks/amp/poselib/poselib/skeleton/skeleton3d.py: SkeletonTree
:42-289, SkeletonState :290-1025, SkeletonMotion :1026-1235).

Host-side numpy tooling (the reference's poselib is offline torch tooling;
train-time motion sampling lives in the device-resident
`utils.motion_lib.MotionLib`).  File format is the reference's
`.npy`-pickled dict serialization — files written here load in the
reference's poselib and vice versa, and `MotionLib` consumes them directly.

Quaternions are xyzw throughout (reference convention).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, Optional, Sequence

import numpy as np

from isaacgymenv_tpu.utils.motion_lib import (
    _np_quat_mul,
    _np_quat_rotate,
    _np_quat_to_angle_axis,
    local_rot_to_dof_np,
)

__all__ = ["SkeletonTree", "SkeletonState", "SkeletonMotion"]


def _arr_to_dict(a: np.ndarray) -> dict:
    return {"arr": np.asarray(a), "context": {"dtype": str(np.asarray(a).dtype)}}


def _arr_from_dict(d: dict) -> np.ndarray:
    return np.asarray(d["arr"], dtype=np.dtype(d["context"]["dtype"]))


class SkeletonTree:
    """Kinematic tree: node names, parent indices, local (bind-pose) joint
    offsets (ref skeleton3d.py:42-289)."""

    def __init__(
        self,
        node_names: Sequence[str],
        parent_indices: np.ndarray,
        local_translation: np.ndarray,
    ):
        self.node_names: List[str] = list(map(str, node_names))
        self.parent_indices = np.asarray(parent_indices, np.int64)
        self.local_translation = np.asarray(local_translation, np.float32)
        assert self.parent_indices.shape == (len(self.node_names),)
        assert self.local_translation.shape == (len(self.node_names), 3)

    def __len__(self) -> int:
        return len(self.node_names)

    @property
    def num_joints(self) -> int:
        return len(self)

    def index(self, node_name: str) -> int:
        return self.node_names.index(node_name)

    def parent_of(self, node_name: str) -> str:
        p = int(self.parent_indices[self.index(node_name)])
        return self.node_names[p] if p >= 0 else ""

    @classmethod
    def from_dict(cls, d: dict) -> "SkeletonTree":
        return cls(
            list(map(str, d["node_names"])),
            _arr_from_dict(d["parent_indices"]),
            _arr_from_dict(d["local_translation"]),
        )

    def to_dict(self) -> dict:
        return {
            "node_names": self.node_names,
            "parent_indices": _arr_to_dict(self.parent_indices),
            "local_translation": _arr_to_dict(self.local_translation),
        }

    @classmethod
    def from_mjcf(cls, path: str) -> "SkeletonTree":
        """Build the tree from an MJCF body hierarchy (ref :176-242: node
        per <body>, local translation from the body pos attribute)."""
        root = ET.parse(path).getroot()
        worldbody = root.find("worldbody")
        if worldbody is None:
            raise ValueError(f"{path}: no <worldbody>")
        names: List[str] = []
        parents: List[int] = []
        offsets: List[np.ndarray] = []

        def visit(body, parent_idx):
            names.append(body.attrib.get("name", f"body_{len(names)}"))
            parents.append(parent_idx)
            pos = np.fromstring(
                body.attrib.get("pos", "0 0 0"), dtype=np.float32, sep=" "
            )
            offsets.append(pos)
            me = len(names) - 1
            for child in body.findall("body"):
                visit(child, me)

        for top in worldbody.findall("body"):
            visit(top, -1)
        if not names:
            raise ValueError(f"{path}: no <body> nodes under worldbody")
        return cls(names, np.asarray(parents), np.stack(offsets))


class SkeletonState:
    """A (batch of) skeleton pose(s): per-joint rotations + root translation
    (ref skeleton3d.py:290-1025).  Rotations are (..., J, 4) xyzw; root
    translation (..., 3).  Global quantities are computed by FK on demand."""

    def __init__(
        self,
        skeleton_tree: SkeletonTree,
        rotation: np.ndarray,
        root_translation: np.ndarray,
        is_local: bool = True,
    ):
        self.skeleton_tree = skeleton_tree
        self.rotation = np.asarray(rotation, np.float32)
        self.root_translation = np.asarray(root_translation, np.float32)
        self.is_local = bool(is_local)
        J = skeleton_tree.num_joints
        assert self.rotation.shape[-2:] == (J, 4), self.rotation.shape
        assert self.root_translation.shape[-1] == 3
        self._fk_cache = None

    # ----- constructors / serialization -----

    @classmethod
    def from_rotation_and_root_translation(
        cls, skeleton_tree, r, t, is_local: bool = True
    ) -> "SkeletonState":
        return cls(skeleton_tree, r, t, is_local)

    @classmethod
    def from_dict(cls, d: dict) -> "SkeletonState":
        return cls(
            SkeletonTree.from_dict(d["skeleton_tree"]),
            _arr_from_dict(d["rotation"]),
            _arr_from_dict(d["root_translation"]),
            bool(d["is_local"]),
        )

    def to_dict(self) -> dict:
        return {
            "rotation": _arr_to_dict(self.rotation),
            "root_translation": _arr_to_dict(self.root_translation),
            "skeleton_tree": self.skeleton_tree.to_dict(),
            "is_local": self.is_local,
            "__name__": type(self).__name__,
        }

    @classmethod
    def from_file(cls, path: str) -> "SkeletonState":
        return cls.from_dict(np.load(path, allow_pickle=True).item())

    def to_file(self, path: str) -> None:
        np.save(path, np.asarray(self.to_dict(), dtype=object), allow_pickle=True)

    # ----- FK -----

    def _fk(self):
        if self._fk_cache is None:
            tree = self.skeleton_tree
            J = tree.num_joints
            parents = tree.parent_indices
            local_t = tree.local_translation
            if self.is_local:
                lrot = self.rotation
                grot = np.zeros_like(lrot)
                gpos = np.zeros(lrot.shape[:-1] + (3,), np.float32)
                for j in range(J):
                    p = int(parents[j])
                    if p < 0:
                        grot[..., j, :] = lrot[..., j, :]
                        gpos[..., j, :] = self.root_translation
                    else:
                        grot[..., j, :] = _np_quat_mul(grot[..., p, :], lrot[..., j, :])
                        gpos[..., j, :] = gpos[..., p, :] + _np_quat_rotate(
                            grot[..., p, :],
                            np.broadcast_to(local_t[j], gpos[..., j, :].shape),
                        )
            else:
                # global-representation state (ref supports both; skeleton3d.py
                # SkeletonState.global_translation): rotations ARE the global
                # rotations, positions follow from the position recursion alone
                grot = self.rotation
                gpos = np.zeros(grot.shape[:-1] + (3,), np.float32)
                for j in range(J):
                    p = int(parents[j])
                    if p < 0:
                        gpos[..., j, :] = self.root_translation
                    else:
                        gpos[..., j, :] = gpos[..., p, :] + _np_quat_rotate(
                            grot[..., p, :],
                            np.broadcast_to(local_t[j], gpos[..., j, :].shape),
                        )
            self._fk_cache = (grot, gpos)
        return self._fk_cache

    @property
    def local_rotation(self) -> np.ndarray:
        if not self.is_local:
            # invert the rotation recursion: lrot[j] = conj(grot[parent]) * grot[j]
            grot = self.rotation
            lrot = np.array(grot, np.float32)
            conj = np.array([-1.0, -1.0, -1.0, 1.0], np.float32)
            for j in range(self.skeleton_tree.num_joints):
                p = int(self.skeleton_tree.parent_indices[j])
                if p >= 0:
                    lrot[..., j, :] = _np_quat_mul(grot[..., p, :] * conj, grot[..., j, :])
            return lrot
        return self.rotation

    @property
    def global_rotation(self) -> np.ndarray:
        if not self.is_local:
            return self.rotation
        return self._fk()[0]

    @property
    def global_translation(self) -> np.ndarray:
        return self._fk()[1]

    @property
    def global_root_rotation(self) -> np.ndarray:
        return self.global_rotation[..., 0, :]

    @property
    def num_joints(self) -> int:
        return self.skeleton_tree.num_joints


class SkeletonMotion(SkeletonState):
    """A skeleton trajectory: SkeletonState over a leading frame axis plus
    fps and derived global velocities (ref skeleton3d.py:1026-1235).

    Velocities match the reference pipeline exactly: central finite
    differences of the FK outputs smoothed with a sigma=2 gaussian along the
    frame axis (mode='nearest'), and the final angular-velocity frame left
    at zero (the reference's dq defaults to identity for the last frame)."""

    def __init__(self, skeleton_tree, rotation, root_translation, fps,
                 is_local=True, global_velocity=None,
                 global_angular_velocity=None):
        super().__init__(skeleton_tree, rotation, root_translation, is_local)
        self.fps = int(fps)
        self._gv = None if global_velocity is None else np.asarray(
            global_velocity, np.float32)
        self._gav = None if global_angular_velocity is None else np.asarray(
            global_angular_velocity, np.float32)

    # ----- constructors / serialization -----

    @classmethod
    def from_skeleton_state(cls, state: SkeletonState, fps: int) -> "SkeletonMotion":
        return cls(state.skeleton_tree, state.rotation, state.root_translation,
                   fps, state.is_local)

    @classmethod
    def from_dict(cls, d: dict) -> "SkeletonMotion":
        gv = d.get("global_velocity")
        gav = d.get("global_angular_velocity")
        return cls(
            SkeletonTree.from_dict(d["skeleton_tree"]),
            _arr_from_dict(d["rotation"]),
            _arr_from_dict(d["root_translation"]),
            int(np.asarray(d["fps"])),
            bool(d["is_local"]),
            None if gv is None else _arr_from_dict(gv),
            None if gav is None else _arr_from_dict(gav),
        )

    def to_dict(self) -> dict:
        d = {
            "rotation": _arr_to_dict(self.rotation),
            "root_translation": _arr_to_dict(self.root_translation),
            "global_velocity": _arr_to_dict(self.global_velocity),
            "global_angular_velocity": _arr_to_dict(self.global_angular_velocity),
            "skeleton_tree": self.skeleton_tree.to_dict(),
            "is_local": self.is_local,
            "fps": np.asarray(self.fps, np.int32),
            "__name__": "SkeletonMotion",
        }
        return d

    @classmethod
    def from_file(cls, path: str) -> "SkeletonMotion":
        return cls.from_dict(np.load(path, allow_pickle=True).item())

    # ----- derived velocities (ref _compute_velocity/_compute_angular_velocity) -----

    @staticmethod
    def _smooth_frames(x: np.ndarray) -> np.ndarray:
        """Reference's gaussian_filter1d(sigma=2, axis=frame, mode='nearest')."""
        from scipy.ndimage import gaussian_filter1d

        return gaussian_filter1d(x, sigma=2, axis=0, mode="nearest")

    @property
    def global_velocity(self) -> np.ndarray:
        if self._gv is None:
            p = self.global_translation  # (F, J, 3)
            v = np.gradient(p, 1.0 / self.fps, axis=0)
            self._gv = self._smooth_frames(v).astype(np.float32)
        return self._gv

    @property
    def global_angular_velocity(self) -> np.ndarray:
        if self._gav is None:
            r = self.global_rotation  # (F, J, 4)
            # dq = q[t+1] * conj(q[t]); omega = axis*angle*fps.  The last
            # frame's dq stays identity (zero velocity), as in the reference.
            conj = r[:-1] * np.array([-1.0, -1.0, -1.0, 1.0], np.float32)
            dq = _np_quat_mul(r[1:], conj)
            angle, axis = _np_quat_to_angle_axis(dq)
            w = axis * angle[..., None] * self.fps
            w = np.concatenate([w, np.zeros_like(w[-1:])], axis=0)
            self._gav = self._smooth_frames(w).astype(np.float32)
        return self._gav

    @property
    def num_frames(self) -> int:
        return self.rotation.shape[0]

    @property
    def duration(self) -> float:
        return (self.num_frames - 1) / self.fps

    # ----- sim-dof conversion (MotionLib parity) -----

    def dof_positions(self, num_dof: int) -> np.ndarray:
        """(F, num_dof) sim dof positions for the AMP humanoid layout
        (ref motion_lib.py:265-293)."""
        return local_rot_to_dof_np(self.local_rotation, num_dof)

    def retarget_to(
        self,
        joint_mapping: dict,
        source_tpose: "SkeletonState",
        target_tpose: "SkeletonState",
        rotation_to_target_skeleton: Optional[np.ndarray] = None,
        scale_to_target_skeleton: float = 1.0,
    ) -> "SkeletonMotion":
        """Delegates to utils.retarget (skeleton3d.py:814-976 semantics)."""
        from isaacgymenv_tpu.utils import retarget as rt

        def as_pose(s: SkeletonState) -> rt.Pose:
            sk = rt.load_skeleton(s.skeleton_tree.to_dict())
            return rt.Pose(
                sk,
                np.asarray(s.local_rotation, np.float64),
                np.asarray(s.root_translation, np.float64),
            )

        out = rt.retarget_motion(
            as_pose(self),
            as_pose(source_tpose),
            as_pose(target_tpose),
            joint_mapping,
            rotation_to_target_skeleton,
            scale_to_target_skeleton,
        )
        return SkeletonMotion(
            self.skeleton_tree.__class__(
                out.skeleton.node_names,
                out.skeleton.parents,
                out.skeleton.local_translation,
            ),
            out.local_rotation,
            out.root_translation,
            self.fps,
        )
