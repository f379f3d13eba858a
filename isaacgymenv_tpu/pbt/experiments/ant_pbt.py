"""3-policy Ant PBT run (ref: pbt/experiments/ant_pbt.py:1-36)."""

from isaacgymenv_tpu.pbt.experiments.run_utils import version
from isaacgymenv_tpu.pbt.run_description import Experiment, ParamGrid, RunDescription

_env = "ant"
_name = f"{_env}_{version}"
_iterations = 10000
_pbt_num_policies = 3

_params = ParamGrid([
    ("pbt.policy_idx", list(range(_pbt_num_policies))),
])

_experiments = [
    Experiment(
        f"{_name}",
        f"python -m isaacgymenv_tpu.train task=Ant headless=True "
        f"max_iterations={_iterations} num_envs=2048 seed=-1 "
        f"train.params.config.save_frequency=2000 "
        f"pbt=pbt_default pbt.num_policies={_pbt_num_policies} "
        f"pbt.workspace=workspace_{_name} "
        f"pbt.initial_delay=10000000 pbt.interval_steps=5000000 "
        f"pbt.start_after=10000000 pbt.mutation_scheme=ant_mutation",
        _params,
    ),
]

RUN_DESCRIPTION = RunDescription(f"{_name}", experiments=_experiments)
