#!/bin/bash
# Learning-evidence ladder (VERDICT r2 item #4): sequential flagship training
# runs on the real TPU chip.  Each job logs stdout to runs/logs/<name>.log;
# scripts/collect_evidence.py turns the logs into committed CSV + a table.
#
# Reference expectations (BASELINE.md):
# - Ant: runnable policy in "a minute or two" (README.md:65-85)
# - Anymal: walking; AnymalTerrain: terrain-curriculum walking (rl_examples)
# - ShadowHand: consecutive successes trending > 0
# - HumanoidAMP: imitation in ~6 min on A100 (rl_examples.md:351)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

run() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  timeout "${JOB_TIMEOUT:-5400}" python -m isaacgymenv_tpu.train "$@" \
    experiment="$name" > "runs/logs/$name.log" 2>&1
  echo "=== $name exit: $? ==="
  tail -n 3 "runs/logs/$name.log"
}

# AnymalTerrain runs the procedural trimesh curriculum (the flagship demo
# config; the shipped yaml default is plane for reference parity) so
# episode/terrain_level promotion is exercised and logged.
run Ant_r2 task=Ant headless=True max_iterations=500
run Anymal_r2 task=Anymal headless=True max_iterations=800
run AnymalTerrain_r2 task=AnymalTerrain headless=True max_iterations=1500 \
    env.terrain.terrainType=trimesh
run ShadowHand_r2 task=ShadowHand headless=True max_iterations=2500
run HumanoidAMP_r2 task=HumanoidAMP headless=True max_iterations=2500
run HoundTerrain_r2 task=HoundTerrain headless=True max_iterations=1000 \
    env.terrain.terrainType=trimesh
echo "ladder done"
