"""Shared CLI base for the AllegroKuka PBT experiment family
(ref: pbt/experiments/allegro_kuka_pbt_base.py)."""

from isaacgymenv_tpu.pbt.experiments.run_utils import default_num_frames, version
from isaacgymenv_tpu.pbt.run_description import Experiment, ParamGrid, RunDescription

kuka_env = "allegro_kuka"
_frames = default_num_frames

pbt_num_policies = 8

# our CLI: subtask selects the env variant (the reference's `task/env=<x>`
# hydra group); LSTM runs use the *PPO LSTM train config via train=
kuka_base_cli = (
    "python -m isaacgymenv_tpu.train seed=-1 headless=True "
    "pbt=pbt_default pbt.workspace=workspace_" + kuka_env + " "
    "pbt.interval_steps=20000000 pbt.start_after=100000000 "
    "pbt.initial_delay=200000000 pbt.replace_fraction_worst=0.3 "
    "pbt.mutation_scheme=allegro_kuka_mutation"
)


def make_pbt_run(subtask: str, two_arms: bool = False, num_policies: int = pbt_num_policies):
    task = "AllegroKukaTwoArms" if two_arms else "AllegroKuka"
    name = f"{kuka_env}{'_two_arms' if two_arms else ''}_{subtask}_{version}_pbt_{num_policies}p"
    params = ParamGrid([("pbt.policy_idx", list(range(num_policies)))])
    cli = (
        kuka_base_cli
        + f" task={task} env.subtask={subtask} pbt.num_policies={num_policies}"
    )
    return RunDescription(
        name, experiments=[Experiment(name, cli, params)]
    )


def make_single_run(subtask: str, two_arms: bool = False, num_seeds: int = 1,
                    multi_gpu: bool = False, name_suffix: str = ""):
    from isaacgymenv_tpu.pbt.experiments.run_utils import seeds

    task = "AllegroKukaTwoArms" if two_arms else "AllegroKuka"
    name = f"{kuka_env}{'_two_arms' if two_arms else ''}_{subtask}_{version}{name_suffix}"
    params = ParamGrid([("seed", seeds(num_seeds))])
    cli = (
        f"python -m isaacgymenv_tpu.train headless=True "
        f"task={task} env.subtask={subtask}"
        + (" multi_gpu=True" if multi_gpu else "")
    )
    return RunDescription(name, experiments=[Experiment(name, cli, params)])
