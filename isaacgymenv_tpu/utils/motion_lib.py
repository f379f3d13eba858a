"""Device-resident motion library for AMP.

Replaces the reference's MotionLib (ref: tasks/amp/utils_amp/motion_lib.py)
and the poselib SkeletonMotion loader it depends on: the `.npy` motion files
store local joint rotations + root translation + a skeleton tree
(poselib/skeleton/skeleton3d.py serialization); everything needed at train
time is precomputed on the host into PADDED device arrays, so motion-state
lookup (`get_motion_state`, ref :83-152) becomes a pure jittable
gather+slerp — no per-motion host loop, fully fusable into the env reset.

DOF mapping (ref: humanoid_amp_base.py:41-42): 12 sim joints over 15
skeleton nodes — 3-dof groups use exp-map coordinates, 1-dof groups the
y-axis rotation angle (elbows/knees).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import struct

from isaacgymenv_tpu.ops import maths

# skeleton-node ids carrying sim dofs + dof layout (ref: humanoid_amp_base.py:41-42)
DOF_BODY_IDS = (1, 2, 3, 4, 6, 7, 9, 10, 11, 12, 13, 14)
DOF_OFFSETS = (0, 3, 6, 9, 10, 13, 14, 17, 18, 21, 24, 25, 28)


def _np_quat_mul(a, b):
    x1, y1, z1, w1 = np.moveaxis(a, -1, 0)
    x2, y2, z2, w2 = np.moveaxis(b, -1, 0)
    return np.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def _np_quat_rotate(q, v):
    xyz, w = q[..., :3], q[..., 3:4]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def _np_quat_to_angle_axis(q):
    w = np.clip(q[..., 3], -1.0, 1.0)
    angle = 2.0 * np.arccos(w)
    angle = (angle + np.pi) % (2 * np.pi) - np.pi
    s2 = 1.0 - w * w
    sin_half = np.sqrt(np.maximum(s2, 1e-12))
    axis = q[..., :3] / sin_half[..., None]
    default = np.zeros_like(axis)
    default[..., 0] = 1.0
    axis = np.where((s2 > 1e-9)[..., None], axis, default)
    return angle, axis


def local_rot_to_dof_np(local_rot: np.ndarray, num_dof: int) -> np.ndarray:
    """(F, 15, 4) local rotations -> (F, num_dof) sim dof positions
    (ref: _local_rotation_to_dof, motion_lib.py:265-293)."""
    F = local_rot.shape[0]
    dof = np.zeros((F, num_dof), np.float32)
    for j, body in enumerate(DOF_BODY_IDS):
        o = DOF_OFFSETS[j]
        size = DOF_OFFSETS[j + 1] - o
        q = local_rot[:, body]
        angle, axis = _np_quat_to_angle_axis(q)
        if size == 3:
            dof[:, o : o + 3] = axis * angle[..., None]
        else:
            theta = angle * axis[..., 1]  # joints assumed along y
            dof[:, o] = (theta + np.pi) % (2 * np.pi) - np.pi
    return dof


@struct.dataclass
class MotionData:
    """Padded per-motion arrays: M motions x F_max frames."""

    root_pos: jnp.ndarray       # (M, F, 3) global root translation
    root_rot: jnp.ndarray       # (M, F, 4) global root rotation (xyzw)
    root_vel: jnp.ndarray       # (M, F, 3)
    root_ang_vel: jnp.ndarray   # (M, F, 3)
    local_rot: jnp.ndarray      # (M, F, J, 4)
    dof_vel: jnp.ndarray        # (M, F, nd)
    key_pos: jnp.ndarray        # (M, F, K, 3) global key-body positions
    length: jnp.ndarray         # (M,) seconds
    dt: jnp.ndarray             # (M,)
    num_frames: jnp.ndarray     # (M,) int32
    weights: jnp.ndarray        # (M,) normalized sampling weights


class MotionLib:
    def __init__(
        self,
        motion_file: str,
        num_dofs: int,
        key_body_names: Sequence[str],
        asset_dir: Optional[str] = None,
    ):
        self.num_dofs = num_dofs
        files, weights = self._fetch_motion_files(motion_file, asset_dir)
        raws = [self._load_one(f, key_body_names) for f in files]
        F = max(r["root_pos"].shape[0] for r in raws)

        def pad(key, shape_tail):
            out = np.zeros((len(raws), F) + shape_tail, np.float32)
            for i, r in enumerate(raws):
                f = r[key].shape[0]
                out[i, :f] = r[key]
                out[i, f:] = r[key][-1]  # clamp-pad with the last frame
            return out

        J = raws[0]["local_rot"].shape[1]
        K = raws[0]["key_pos"].shape[1]
        w = np.asarray(weights, np.float64)
        self.data = MotionData(
            root_pos=jnp.array(pad("root_pos", (3,))),
            root_rot=jnp.array(pad("root_rot", (4,))),
            root_vel=jnp.array(pad("root_vel", (3,))),
            root_ang_vel=jnp.array(pad("root_ang_vel", (3,))),
            local_rot=jnp.array(pad("local_rot", (J, 4))),
            dof_vel=jnp.array(pad("dof_vel", (num_dofs,))),
            key_pos=jnp.array(pad("key_pos", (K, 3))),
            length=jnp.array([r["length"] for r in raws], jnp.float32),
            dt=jnp.array([r["dt"] for r in raws], jnp.float32),
            num_frames=jnp.array([r["root_pos"].shape[0] for r in raws], jnp.int32),
            weights=jnp.array(w / w.sum(), jnp.float32),
        )

    # ------------------------------------------------------------- host load
    def _fetch_motion_files(self, motion_file, asset_dir):
        """Single .npy, or a .yaml listing {file, weight} entries
        (ref: motion_lib.py:209-232)."""
        if motion_file.endswith(".yaml"):
            with open(motion_file) as f:
                cfg = yaml.safe_load(f)
            base = os.path.dirname(motion_file)
            files, weights = [], []
            for entry in cfg["motions"]:
                files.append(os.path.join(base, entry["file"]))
                weights.append(float(entry.get("weight", 1.0)))
            return files, weights
        return [motion_file], [1.0]

    def _load_one(self, path, key_body_names):
        d = np.load(path, allow_pickle=True).item()
        local_rot = np.asarray(d["rotation"]["arr"], np.float32)  # (F, J, 4) xyzw
        root_pos = np.asarray(d["root_translation"]["arr"], np.float32)
        gvel = np.asarray(d["global_velocity"]["arr"], np.float32)
        gangvel = np.asarray(d["global_angular_velocity"]["arr"], np.float32)
        tree = d["skeleton_tree"]
        parents = np.asarray(tree["parent_indices"]["arr"])
        local_t = np.asarray(tree["local_translation"]["arr"], np.float32)
        names = list(tree["node_names"])
        fps = float(d["fps"])
        F, J = local_rot.shape[:2]

        # FK: local -> global rotations and translations
        grot = np.zeros_like(local_rot)
        gpos = np.zeros((F, J, 3), np.float32)
        for j in range(J):
            p = parents[j]
            if p < 0:
                grot[:, j] = local_rot[:, j]
                gpos[:, j] = root_pos
            else:
                grot[:, j] = _np_quat_mul(grot[:, p], local_rot[:, j])
                gpos[:, j] = gpos[:, p] + _np_quat_rotate(grot[:, p], local_t[None, j])

        key_ids = [names.index(n) for n in key_body_names]
        dof_vel = self._dof_vels(local_rot, fps)
        return dict(
            root_pos=gpos[:, 0],
            root_rot=grot[:, 0],
            root_vel=gvel[:, 0],
            root_ang_vel=gangvel[:, 0],
            local_rot=local_rot,
            dof_vel=dof_vel,
            key_pos=gpos[:, key_ids],
            length=(F - 1) / fps,
            dt=1.0 / fps,
        )

    def _dof_vels(self, local_rot, fps):
        """Finite-difference joint velocities (ref: motion_lib.py:248-263)."""
        F = local_rot.shape[0]
        q0, q1 = local_rot[:-1], local_rot[1:]
        q0_inv = q0 * np.array([-1, -1, -1, 1], np.float32)
        dq = _np_quat_mul(q0_inv, q1)
        angle, axis = _np_quat_to_angle_axis(dq)
        local_vel = axis * angle[..., None] * fps  # (F-1, J, 3)
        dof_vel = np.zeros((F, self.num_dofs), np.float32)
        for j, body in enumerate(DOF_BODY_IDS):
            o = DOF_OFFSETS[j]
            size = DOF_OFFSETS[j + 1] - o
            if size == 3:
                dof_vel[:-1, o : o + 3] = local_vel[:, body]
            else:
                dof_vel[:-1, o] = local_vel[:, body, 1]
        dof_vel[-1] = dof_vel[-2]
        return dof_vel

    # --------------------------------------------------------- device sample
    def sample_motions(self, key: jax.Array, n: int) -> jnp.ndarray:
        return jax.random.choice(
            key, self.data.length.shape[0], (n,), p=self.data.weights
        )

    def sample_time(self, key: jax.Array, motion_ids: jnp.ndarray, truncate: float = 0.0):
        phase = jax.random.uniform(key, motion_ids.shape)
        return phase * jnp.maximum(self.data.length[motion_ids] - truncate, 0.0)

    def get_motion_state(self, motion_ids: jnp.ndarray, motion_times: jnp.ndarray):
        """Blended state at arbitrary times (pure; ref: get_motion_state :83).

        Returns (root_pos, root_rot, dof_pos, root_vel, root_ang_vel,
        dof_vel, key_pos)."""
        d = self.data
        nf = d.num_frames[motion_ids]
        dt = d.dt[motion_ids]
        length = d.length[motion_ids]
        phase = jnp.clip(motion_times / jnp.maximum(length, 1e-6), 0.0, 1.0)
        f0 = (phase * (nf - 1)).astype(jnp.int32)
        f1 = jnp.minimum(f0 + 1, nf - 1)
        blend = jnp.clip((motion_times - f0 * dt) / dt, 0.0, 1.0)[:, None]

        def g(arr, f):
            return arr[motion_ids, f]

        root_pos = (1 - blend) * g(d.root_pos, f0) + blend * g(d.root_pos, f1)
        root_rot = maths.slerp(g(d.root_rot, f0), g(d.root_rot, f1), blend)
        key_pos = (
            (1 - blend)[:, None] * g(d.key_pos, f0)
            + blend[:, None] * g(d.key_pos, f1)
        )
        local_rot = maths.slerp(
            g(d.local_rot, f0), g(d.local_rot, f1), blend[:, None]
        )
        dof_pos = self._local_rot_to_dof(local_rot)
        root_vel = g(d.root_vel, f0)
        root_ang_vel = g(d.root_ang_vel, f0)
        dof_vel = g(d.dof_vel, f0)
        return root_pos, root_rot, dof_pos, root_vel, root_ang_vel, dof_vel, key_pos

    def _local_rot_to_dof(self, local_rot: jnp.ndarray) -> jnp.ndarray:
        """jnp version of local_rot_to_dof_np (fixed 12-group loop, unrolled)."""
        parts = []
        for j, body in enumerate(DOF_BODY_IDS):
            size = DOF_OFFSETS[j + 1] - DOF_OFFSETS[j]
            q = local_rot[:, body]
            if size == 3:
                parts.append(maths.quat_to_exp_map(q))
            else:
                angle, axis = maths.quat_to_angle_axis(q)
                theta = maths.normalize_angle(angle * axis[..., 1])
                parts.append(theta[:, None])
        return jnp.concatenate(parts, axis=-1)
