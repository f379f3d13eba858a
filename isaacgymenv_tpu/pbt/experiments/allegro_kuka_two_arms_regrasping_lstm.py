"""Single-policy AllegroKukaTwoArms regrasping run (ref: pbt/experiments/allegro_kuka_two_arms_regrasping_lstm.py)."""

from isaacgymenv_tpu.pbt.experiments.allegro_kuka_pbt_base import make_single_run

RUN_DESCRIPTION = make_single_run("regrasping", two_arms=True)
