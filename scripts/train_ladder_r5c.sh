#!/bin/bash
# Round-5 ladder part 3 (all runs on the deadbeat-contact physics,
# commit ece08e7):
# - UsefulHound: first run crashed on the fused VMEM OOM (gate now routes
#   its scene to the XLA path)
# - HoundTerrain: retrain on the fork-parity termination rule
#   (trunk|thigh|shoulder unconditional — crawling is terminal)
# - manipulation redos: the part-2 runs trained against bouncing objects
# - ShadowHand retrain on the matmul-scatter XLA contact path
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
run AllegroKukaReorientation_r5b 2400 task=AllegroKukaReorientation headless=True \
    max_iterations=2000
run FrankaCubeStack_r5b 1500 task=FrankaCubeStack headless=True max_iterations=1500
run ShadowHand_r5 2400 task=ShadowHand headless=True max_iterations=2000
echo "ladder r5 part3 done"

# clean post-training measurements (chip now free)
python scripts/validate_fused_shadowhand.py 4096 > runs/logs/shadowhand_xla_bench.log 2>&1
python scripts/amp_imitation_metric.py runs/HumanoidAMPBackflip_r5/nn/HumanoidAMPBackflip_r5_best.ckpt \
    amp_humanoid_backflip.npy > runs/logs/amp_backflip_metric.log 2>&1 || true
python bench.py > runs/logs/bench_r5.log 2>&1
echo "ladder r5 part3 benches done"
