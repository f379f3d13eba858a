"""Multi-chip AllegroKuka reorientation run (ref:
pbt/experiments/allegro_kuka_reorientation_lstm_8gpu.py — torchrun 8-GPU
there; here multi_gpu=True shards the env axis over all visible TPU chips)."""

from isaacgymenv_tpu.pbt.experiments.allegro_kuka_pbt_base import make_single_run

RUN_DESCRIPTION = make_single_run("reorientation", multi_gpu=True, name_suffix="_8chip")
