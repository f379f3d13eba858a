#!/bin/bash
# Round-4 learning-evidence ladder: the first full ladder trained on the
# anchored-spring stiction contact law (physics/contact.py) with committed
# results.  The r2 evidence in docs/evidence/ predates stiction (stance feet
# skated: flat Anymal tracked ~54% of commanded velocity, terrain_level
# stuck at ~0.05); the r3 reruns finished after the round's evidence
# collection.  Budgets are hard wall-clock caps; periodic checkpoints mean
# a timeout still leaves usable curves in runs/logs/.
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

run Anymal_r4 900 task=Anymal headless=True max_iterations=800
run Ant_r4 900 task=Ant headless=True max_iterations=500
run AnymalTerrain_r4 3600 task=AnymalTerrain headless=True max_iterations=3000 \
    env.terrain.terrainType=trimesh
run HumanoidAMP_r4 2400 task=HumanoidAMP headless=True max_iterations=2500
run ShadowHand_r4 2400 task=ShadowHand headless=True max_iterations=2500
run HoundTerrain_r4 1800 task=HoundTerrain headless=True max_iterations=1500 \
    env.terrain.terrainType=trimesh
echo "ladder done"
python scripts/collect_evidence.py --logs runs/logs --out docs/evidence
