"""8-policy PBT on AllegroKuka throw (ref: pbt/experiments/allegro_kuka_throw_pbt_lstm.py)."""

from isaacgymenv_tpu.pbt.experiments.allegro_kuka_pbt_base import make_pbt_run

RUN_DESCRIPTION = make_pbt_run("throw")
