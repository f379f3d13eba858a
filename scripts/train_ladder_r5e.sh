#!/bin/bash
# Round-5 continuation queue (post relay-recovery session).  Runs the
# remaining owed evidence serially on the single chip; collects CSVs after
# every run so partial progress survives an abrupt round end.  First
# compiles are served from the persistent .xla_cache after each task's
# first launch, so re-runs start epochs almost immediately.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

# Wait for any already-running train process to finish first.
while pgrep -f "isaacgymenv_tpu.train" > /dev/null 2>&1; do sleep 20; done

run() {
  local name="$1" budget="$2"; shift 2
  echo "=== $name: $* (budget ${budget}s) ==="
  timeout "$budget" python -m isaacgymenv_tpu.train "$@" \
    experiment="$name" >> "runs/logs/$name.log" 2>&1
  echo "=== $name exit: $? ==="
  python scripts/collect_r5_evidence.py "$name" > /dev/null 2>&1 || true
}

# flagship continuation: warm compile cache, restore from the best ckpt of
# the first slice when present
UH_CKPT=""
if ls runs/UsefulHound_r5/nn/*best* > /dev/null 2>&1; then
  UH_CKPT="checkpoint=$(ls runs/UsefulHound_r5/nn/*best* | head -1)"
fi
run UsefulHound_r5 2400 task=UsefulHound headless=True max_iterations=2000 \
    $UH_CKPT
run AllegroKukaReorientation_r5b 2400 task=AllegroKukaReorientation \
    headless=True max_iterations=2000
run ShadowHand_r5 2400 task=ShadowHand headless=True max_iterations=2000
run HoundTerrain_r5b 2400 task=HoundTerrain headless=True \
    max_iterations=2000 env.terrain.terrainType=trimesh
run FrankaCubeStack_r5b 1500 task=FrankaCubeStack headless=True \
    max_iterations=1500
run AllegroHandDextremeManualDR_r5 1500 task=AllegroHandDextremeManualDR \
    headless=True max_iterations=1200 num_envs=8192
echo "r5e queue done"
