#!/bin/bash
# Round-4 evidence ladder, part 2: the jobs round-4a lost to remote-compile
# time (Ant, HoundTerrain produced no epochs inside their budgets) plus
# checkpoint-resumed continuations of AnymalTerrain and ShadowHand.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

run() {
  local name="$1" budget="$2"; shift 2
  echo "=== $name: $* (budget ${budget}s) ==="
  timeout "$budget" python -m isaacgymenv_tpu.train "$@" \
    experiment="$name" >> "runs/logs/$name.log" 2>&1
  echo "=== $name exit: $? ==="
  grep -a "epoch" "runs/logs/$name.log" | tail -n 1
}

run HoundTerrain_r4 2700 task=HoundTerrain headless=True max_iterations=1500 \
    env.terrain.terrainType=trimesh
run Ant_r4 1200 task=Ant headless=True max_iterations=500
run AnymalTerrain_r4 2400 task=AnymalTerrain headless=True max_iterations=3000 \
    env.terrain.terrainType=trimesh \
    checkpoint=runs/AnymalTerrain_r4/nn/last_AnymalTerrain_r4.ckpt
run ShadowHand_r4 2400 task=ShadowHand headless=True max_iterations=2500 \
    checkpoint=runs/ShadowHand_r4/nn/last_ShadowHand_r4.ckpt
echo "ladder r4b done"
python scripts/collect_evidence.py --logs runs/logs --out docs/evidence
