"""8-policy PBT on AllegroKuka regrasping (ref: pbt/experiments/allegro_kuka_regrasping_pbt_lstm.py)."""

from isaacgymenv_tpu.pbt.experiments.allegro_kuka_pbt_base import make_pbt_run

RUN_DESCRIPTION = make_pbt_run("regrasping")
