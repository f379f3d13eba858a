#!/bin/bash
# Learning-evidence ladder, round 3: retrained on the stiction contact law
# (anchored-spring static friction — physics/contact.py).  The r2 runs were
# trained on a viscous-only friction law where stance feet skated: flat
# Anymal tracked only ~54% of commanded velocity and the terrain tasks
# learned to crawl (terrain_level stuck at ~0.05).
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

run Ant_r3 task=Ant headless=True max_iterations=500
run Anymal_r3 task=Anymal headless=True max_iterations=800
run AnymalTerrain_r3 task=AnymalTerrain headless=True max_iterations=1500 \
    env.terrain.terrainType=trimesh
run ShadowHand_r3 task=ShadowHand headless=True max_iterations=2500
run HumanoidAMP_r3s task=HumanoidAMP headless=True max_iterations=2500
run HoundTerrain_r3 task=HoundTerrain headless=True max_iterations=1000 \
    env.terrain.terrainType=trimesh
echo "ladder done"
