#!/bin/bash
# End-to-end multi-process PBT demonstration (VERDICT r1 item 7 tail):
# 3 Cartpole policies on the CPU backend coordinating through a shared
# filesystem workspace with small interval_steps so ranking/replacement/
# mutation/self-restart actually trigger within minutes.
#
# Evidence of a full PBT cycle lands in runs/logs/pbt_demo/:
#   pbt_XXX.log        per-policy stdout (look for "restarting self")
#   workspace/<idx>/   {iteration:06d}.yaml/.ckpt protocol files
# Summarized into docs/evidence/pbt_demo.md by scripts/collect_pbt_evidence.py.
set -u
cd "$(dirname "$0")/.."
WS=runs/pbt_demo_ws
LOGS=runs/logs/pbt_demo
rm -rf "$WS" "$LOGS"
mkdir -p "$LOGS"

# scaled to the 1-CPU demo host: tiny env count, PBT iteration every ~5
# epochs so ranking/replacement fire well inside the wall-clock budget
JAX_PLATFORMS=cpu timeout 2700 python -m isaacgymenv_tpu.pbt.launcher \
  --num_policies 3 --max_parallel 3 -- \
  task=Cartpole headless=True max_iterations=60 num_envs=128 \
  pbt=pbt_default "pbt.workspace=$WS" \
  pbt.num_policies=3 \
  pbt.interval_steps=10000 pbt.start_after=10000 pbt.initial_delay=20000 \
  train.params.config.minibatch_size=1024 \
  train.params.config.save_frequency=20 \
  > "$LOGS/launcher.log" 2>&1
echo "pbt demo exit: $?"
echo "self-restarts (replacement+mutation events):"
grep -ac "restarting self" "$LOGS/launcher.log" || true
echo "workspace checkpoints:"
ls runs/pbt_demo_ws/*/ | head -20
