"""Hound — the fork's quadruped, anear-clone of Anymal with the Hound URDF.

Behavioral spec (ref: tasks/hound.py — ~44 changed lines vs anymal.py):
- asset urdf/Hound_new/Hound.urdf, collapseFixedJoints from cfg (default
  False; hound URDF keeps fixed joints), no capsule replacement
- base link "trunk" (hound.py:224), knee fragment "thigh", feet "calf"
- everything else (obs/reward/reset/commands/PD control) identical to Anymal
"""

from __future__ import annotations

from isaacgymenv_tpu.envs.anymal import Anymal
from isaacgymenv_tpu.envs.registry import register


@register("Hound")
class Hound(Anymal):
    knee_fragment = "thigh"
    base_name = "trunk"

    def __init__(self, cfg):
        cfg["env"].setdefault("urdfAsset", {}).setdefault(
            "file", "urdf/Hound_new/Hound.urdf"
        )
        cfg["env"]["urdfAsset"].setdefault("collapseFixedJoints", False)
        super().__init__(cfg)
        names = self.model.body_names
        self.feet_indices = [i for i, n in enumerate(names) if "calf" in n]
