"""HoundTerrain — the fork's quadruped on curriculum terrain.

Behavioral spec (ref: tasks/Hound_terrain.py — a clone of anymal_terrain.py):
- asset urdf/Hound_new/Hound.urdf, fixed joints kept (foot links exist),
  footName "foot", kneeName "thigh" (cfg/task/HoundTerrain.yaml urdfAsset)
- termination (check_termination :304-309): "trunk" contact OR any "thigh"
  contact OR any "shoulder" contact, all UNCONDITIONAL — the fork replaced
  anymal's allowKneeContacts-gated rule (the gate survives only as a
  commented-out block :311-314).  Crawling/kneeling is therefore terminal,
  unlike our previous (wrongly inherited) anymal rule which let policies
  settle into a knee-walk local optimum.
- base height target 0.48 (Hound_terrain.py:347)
- hip cosmetic penalty on the roll joints (dof [0,3,6,9] in the reference's
  PhysX ordering == the *_roll_joint dofs; Hound_terrain.py:375-376)
- everything else (obs 188 / act 12 / reward terms / curriculum / pushes)
  identical to AnymalTerrain.
"""

from __future__ import annotations

import jax.numpy as jnp
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
        # shoulder links join the termination set (ref :257, :306 — the cfg
        # baseName "shoulder" feeds base_indices; base_index is the
        # hardcoded "trunk" lookup at :302)
        self.shoulder_indices = np.array(
            [i for i, n in enumerate(self.model.body_names) if "shoulder" in n]
        )

    def _termination(self, cf, knee_contact):
        """Fork parity: trunk | any thigh | any shoulder contact, no
        allowKneeContacts gate (ref Hound_terrain.py:304-309)."""
        done = jnp.linalg.norm(cf[:, self.base_index], axis=-1) > 1.0
        done = done | jnp.any(knee_contact, axis=1)
        if len(self.shoulder_indices):
            sh = jnp.linalg.norm(cf[:, self.shoulder_indices], axis=-1) > 1.0
            done = done | jnp.any(sh, axis=1)
        return done
