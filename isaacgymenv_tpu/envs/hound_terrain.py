"""HoundTerrain — the fork's quadruped on curriculum terrain.

Behavioral spec (ref: tasks/Hound_terrain.py — a clone of anymal_terrain.py):
- asset urdf/Hound_new/Hound.urdf, fixed joints kept (foot links exist),
  footName "foot", kneeName "thigh" (cfg/task/HoundTerrain.yaml urdfAsset)
- termination on "trunk" contact only (Hound_terrain.py:302-308;
  allowKneeContacts true disables the knee term)
- base height target 0.48 (Hound_terrain.py:347)
- hip cosmetic penalty on the roll joints (dof [0,3,6,9] in the reference's
  PhysX ordering == the *_roll_joint dofs; Hound_terrain.py:375-376)
- everything else (obs 188 / act 12 / reward terms / curriculum / pushes)
  identical to AnymalTerrain.
"""

from __future__ import annotations

import numpy as np

from isaacgymenv_tpu.envs.anymal_terrain import AnymalTerrain
from isaacgymenv_tpu.envs.registry import register


@register("HoundTerrain")
class HoundTerrain(AnymalTerrain):
    base_height_target = 0.48  # ref: Hound_terrain.py:347

    def __init__(self, cfg):
        ua = cfg["env"].setdefault("urdfAsset", {})
        ua.setdefault("file", "urdf/Hound_new/Hound.urdf")
        ua.setdefault("footName", "foot")
        ua.setdefault("kneeName", "thigh")
        ua.setdefault("baseName", "trunk")
        ua.setdefault("collapseFixedJoints", False)
        super().__init__(cfg)
        # roll joints are the hip-abduction analog (ref dof order [0,3,6,9])
        self.hip_dofs = np.array(
            [i for i, n in enumerate(self.model.dof_names) if "roll" in n]
        )
