"""8-policy PBT on AllegroKukaTwoArms reorientation (ref: pbt/experiments/allegro_kuka_two_arms_reorientation_pbt_lstm.py)."""

from isaacgymenv_tpu.pbt.experiments.allegro_kuka_pbt_base import make_pbt_run

RUN_DESCRIPTION = make_pbt_run("reorientation", two_arms=True)
