"""Canned experiment definitions (ref: pbt/experiments/*.py, 11 files).

Each module exports RUN_DESCRIPTION; launch with:

    python -m isaacgymenv_tpu.pbt.launcher_runs \
        --run isaacgymenv_tpu.pbt.experiments.ant_pbt
"""
