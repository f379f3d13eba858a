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


def _resolve_allegro_kuka(cfg):
    """Dispatch by cfg env.subtask (ref: tasks/__init__.py:62-75)."""
    sub = str(cfg.get("env", {}).get("subtask", "") or "reorientation")
    names = {
        "reorientation": "AllegroKukaReorientation",
        "regrasping": "AllegroKukaRegrasping",
        "throw": "AllegroKukaThrow",
    }
    if sub not in names:
        raise ValueError(f"Unknown subtask={sub!r} in {sorted(names)}")
    return get_task(names[sub])(cfg)


def _resolve_allegro_kuka_two_arms(cfg):
    """Dispatch by cfg env.subtask (ref: tasks/__init__.py:77-86)."""
    sub = str(cfg.get("env", {}).get("subtask", "") or "reorientation")
    names = {
        "reorientation": "AllegroKukaTwoArmsReorientation",
        "regrasping": "AllegroKukaTwoArmsRegrasping",
    }
    if sub not in names:
        raise ValueError(f"Unknown subtask={sub!r} in {sorted(names)}")
    return get_task(names[sub])(cfg)


def _import_all():
    import importlib

    for mod, cls, name in _TASKS:
        try:
            m = importlib.import_module(f"isaacgymenv_tpu.envs.{mod}")
            _REGISTRY.setdefault(name, getattr(m, cls))
        except (ImportError, AttributeError):
            pass
    # cfg-dependent resolvers (factory callables, constructor-compatible)
    _REGISTRY["AllegroKuka"] = _resolve_allegro_kuka
    _REGISTRY["AllegroKukaTwoArms"] = _resolve_allegro_kuka_two_arms


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
    # "AllegroKuka"/"AllegroKukaTwoArms" resolve by cfg env.subtask via the
    # factory callables installed in _import_all (ref: tasks/__init__.py:62-86)
    ("allegro_kuka_two_arms", "AllegroKukaTwoArmsReorientation", "AllegroKukaTwoArmsReorientation"),
    ("allegro_kuka_two_arms", "AllegroKukaTwoArmsRegrasping", "AllegroKukaTwoArmsRegrasping"),
    ("factory_nut_bolt_pick", "FactoryTaskNutBoltPick", "FactoryTaskNutBoltPick"),
    ("factory_nut_bolt_place", "FactoryTaskNutBoltPlace", "FactoryTaskNutBoltPlace"),
    ("factory_nut_bolt_screw", "FactoryTaskNutBoltScrew", "FactoryTaskNutBoltScrew"),
    ("factory_sandbox", "FactoryTaskInsertion", "FactoryTaskInsertion"),
    ("factory_sandbox", "FactoryTaskGears", "FactoryTaskGears"),
]
