"""Task registry: name -> TaskEnv class (ref: tasks/__init__.py:90-120)."""

from __future__ import annotations

from typing import Callable, Dict, Type

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def get_task(name: str):
    if name not in _REGISTRY:
        # lazy imports keep startup light and avoid circular imports
        _import_all()
    if name not in _REGISTRY:
        raise KeyError(f"Unknown task '{name}'. Known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def task_names():
    _import_all()
    return sorted(_REGISTRY)


def _import_all():
    import importlib

    for mod, cls, name in _TASKS:
        try:
            m = importlib.import_module(f"isaacgymenv_tpu.envs.{mod}")
            _REGISTRY.setdefault(name, getattr(m, cls))
        except (ImportError, AttributeError):
            pass


# (module, class, registry name) — mirrors isaacgym_task_map
_TASKS = [
    ("cartpole", "Cartpole", "Cartpole"),
    ("ant", "Ant", "Ant"),
    ("humanoid", "Humanoid", "Humanoid"),
    ("anymal", "Anymal", "Anymal"),
    ("anymal_terrain", "AnymalTerrain", "AnymalTerrain"),
    ("hound", "Hound", "Hound"),
    ("hound_terrain", "HoundTerrain", "HoundTerrain"),
    ("arm_reach", "Houndarm", "Houndarm"),
    ("arm_reach", "Manipulator", "Manipulator"),
    ("useful_hound", "UsefulHound", "UsefulHound"),
    ("ball_balance", "BallBalance", "BallBalance"),
    ("quadcopter", "Quadcopter", "Quadcopter"),
    ("ingenuity", "Ingenuity", "Ingenuity"),
    ("franka_cabinet", "FrankaCabinet", "FrankaCabinet"),
    ("franka_cube_stack", "FrankaCubeStack", "FrankaCubeStack"),
    ("shadow_hand", "ShadowHand", "ShadowHand"),
    ("shadow_hand", "ShadowHand", "ShadowHandOpenAI_LSTM"),
    ("allegro_hand", "AllegroHand", "AllegroHand"),
    ("allegro_hand_dextreme", "AllegroHandDextremeManualDR", "AllegroHandDextremeManualDR"),
    ("allegro_hand_dextreme", "AllegroHandDextremeADR", "AllegroHandDextremeADR"),
    ("humanoid_amp", "HumanoidAMP", "HumanoidAMP"),
    ("trifinger", "Trifinger", "Trifinger"),
    ("allegro_kuka", "AllegroKukaReorientation", "AllegroKukaReorientation"),
    ("allegro_kuka", "AllegroKukaRegrasping", "AllegroKukaRegrasping"),
    ("allegro_kuka", "AllegroKukaThrow", "AllegroKukaThrow"),
    # reference name "AllegroKuka" resolves by cfg env.subtask
    # (ref: tasks/__init__.py:62-86); default = reorientation
    ("allegro_kuka", "AllegroKukaReorientation", "AllegroKuka"),
    ("allegro_kuka_two_arms", "AllegroKukaTwoArmsReorientation", "AllegroKukaTwoArmsReorientation"),
    ("allegro_kuka_two_arms", "AllegroKukaTwoArmsRegrasping", "AllegroKukaTwoArmsRegrasping"),
    ("allegro_kuka_two_arms", "AllegroKukaTwoArmsReorientation", "AllegroKukaTwoArms"),
    ("factory_nut_bolt_pick", "FactoryTaskNutBoltPick", "FactoryTaskNutBoltPick"),
    ("factory_nut_bolt_place", "FactoryTaskNutBoltPlace", "FactoryTaskNutBoltPlace"),
    ("factory_nut_bolt_screw", "FactoryTaskNutBoltScrew", "FactoryTaskNutBoltScrew"),
    ("factory_sandbox", "FactoryTaskInsertion", "FactoryTaskInsertion"),
    ("factory_sandbox", "FactoryTaskGears", "FactoryTaskGears"),
]
