#!/bin/bash
# Round-5 ladder part 3: UsefulHound retry (its fused kernel cannot lower
# within the 16MB scoped-VMEM limit — the recalibrated gate now routes it
# to the XLA path), HoundTerrain retrain on the fork-parity termination rule
# (trunk|thigh|shoulder unconditional — crawling is now terminal), and a
# ShadowHand retrain on the matmul-scatter XLA contact path.
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
run HoundTerrain_r5b 3000 task=HoundTerrain headless=True max_iterations=2500 \
    env.terrain.terrainType=trimesh
run ShadowHand_r5 2400 task=ShadowHand headless=True max_iterations=2000
echo "ladder r5 part3 done"
