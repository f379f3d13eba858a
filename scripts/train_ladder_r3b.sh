#!/bin/bash
# Round-3 evidence ladder (time-boxed): retrain the flagship ladder on the
# stiction contact law (anchored-spring static friction — physics/contact.py).
# The r2 runs used a viscous-only friction law where stance feet skated.
# Each job gets a hard wall-clock budget; periodic checkpoints mean a
# timeout still leaves usable curves in runs/logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

run() {
  local name="$1" budget="$2"; shift 2
  echo "=== $name: $* (budget ${budget}s) ==="
  timeout "$budget" python -m isaacgymenv_tpu.train "$@" \
    experiment="$name" > "runs/logs/$name.log" 2>&1
  echo "=== $name exit: $? ==="
  tail -n 2 "runs/logs/$name.log"
}

run Ant_r3 300 task=Ant headless=True max_iterations=500
run Anymal_r3 420 task=Anymal headless=True max_iterations=800
run AnymalTerrain_r3 1500 task=AnymalTerrain headless=True max_iterations=1500 \
    env.terrain.terrainType=trimesh
run HumanoidAMP_r3 1200 task=HumanoidAMP headless=True max_iterations=2000
run ShadowHand_r3 1200 task=ShadowHand headless=True max_iterations=2000
run HoundTerrain_r3 900 task=HoundTerrain headless=True max_iterations=1000 \
    env.terrain.terrainType=trimesh
echo "ladder done"
