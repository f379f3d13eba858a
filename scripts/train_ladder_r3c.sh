#!/bin/bash
# Round-3 evidence ladder, part 2 (after the Anymal_r3 calibration run):
# budgets = ~7 min axon remote-compile + measured runtime headroom.
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

# wait for the in-flight Anymal_r3 calibration run to drain the TPU
# (stable pattern: arg order independent)
while pgrep -f "isaacgymenv_tpu.train.*Anymal" >/dev/null; do
  sleep 10
done

run AnymalTerrain_r3 1800 task=AnymalTerrain headless=True max_iterations=1500 \
    env.terrain.terrainType=trimesh
run HumanoidAMP_r3 1500 task=HumanoidAMP headless=True max_iterations=2000
run Ant_r3 900 task=Ant headless=True max_iterations=500
run ShadowHand_r3 1500 task=ShadowHand headless=True max_iterations=2000
run HoundTerrain_r3 1200 task=HoundTerrain headless=True max_iterations=1000 \
    env.terrain.terrainType=trimesh
echo "ladder done"
