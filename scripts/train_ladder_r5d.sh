#!/bin/bash
# Round-5 ladder part 4: locomotion re-verification on the deadbeat-contact
# physics (the terrain evidence above trained pre-ece08e7; feet are heavy
# and barely bounced, but the curriculum claim should hold on the CURRENT
# physics), a longer Ant run chasing full-cap episodes, and a DeXtreme
# ManualDR training slice (the family had no learning evidence).
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

run UsefulHound_r5 2400 task=UsefulHound headless=True max_iterations=2000
run AnymalTerrain_r5b 3600 task=AnymalTerrain headless=True max_iterations=3000 \
    env.terrain.terrainType=trimesh
run Ant_r5b 1500 task=Ant headless=True max_iterations=1200
run AllegroHandDextremeManualDR_r5 2400 task=AllegroHandDextremeManualDR \
    headless=True max_iterations=1500 num_envs=8192
echo "ladder r5 part4 done"
