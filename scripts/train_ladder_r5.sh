#!/bin/bash
# Round-5 learning-evidence ladder, part 1: terrain-curriculum retrain on
# the fp32-matmul-precision physics fix (commit ea6a7bf).  The r4 terrain
# runs trained against bf16-quantized world positions (positions ratcheted
# to a ~0.5 m grid at the terrain-grid env origins) — rerun the terrain
# family first to measure the fix.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

run() {
  local name="$1" budget="$2"; shift 2
  echo "=== $name: $* (budget ${budget}s) ==="
  timeout "$budget" python -m isaacgymenv_tpu.train "$@" \
    experiment="$name" > "runs/logs/$name.log" 2>&1
  echo "=== $name exit: $? ==="
  grep -a "epoch" "runs/logs/$name.log" | tail -n 1
}

run AnymalTerrain_r5 4500 task=AnymalTerrain headless=True max_iterations=3500 \
    env.terrain.terrainType=trimesh
run HoundTerrain_r5 2400 task=HoundTerrain headless=True max_iterations=1500 \
    env.terrain.terrainType=trimesh
run Ant_r5 900 task=Ant headless=True max_iterations=500
echo "ladder r5 part1 done"
