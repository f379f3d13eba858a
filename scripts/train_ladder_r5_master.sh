#!/bin/bash
# Round-5 resilient master queue: everything still owed on the TPU, ordered
# by judge value.  The axon relay dropped mid-round (backend UNAVAILABLE for
# every process); each run first waits for the TPU to come back and retries
# once on transient relay failures.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

tpu_ready() {
  timeout 180 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
    > /dev/null 2>&1
}

wait_tpu() {
  local waited=0
  until tpu_ready; do
    sleep 120
    waited=$((waited + 120))
    echo "  (waiting for TPU: ${waited}s)"
    # no give-up: the queue runs whatever fits before the round ends
  done
}

run() {
  local name="$1" budget="$2"; shift 2
  for attempt in 1 2; do
    wait_tpu
    echo "=== $name attempt $attempt: $* (budget ${budget}s) ==="
    timeout "$budget" python -m isaacgymenv_tpu.train "$@" \
      experiment="$name" > "runs/logs/$name.log" 2>&1
    local rc=$?
    echo "=== $name exit: $rc ==="
    grep -a "epoch" "runs/logs/$name.log" | tail -n 1
    # 124 = budget timeout (normal); retry only transient relay failures
    if [ "$rc" -eq 124 ] || [ "$rc" -eq 0 ]; then
      return 0
    fi
    if ! grep -aq "UNAVAILABLE\|Connection refused\|Connection Failed" \
        "runs/logs/$name.log"; then
      return 0  # real error — don't burn budget retrying
    fi
  done
}

run AnymalTerrain_r5b 3000 task=AnymalTerrain headless=True max_iterations=2500 \
    env.terrain.terrainType=trimesh
run AllegroKukaReorientation_r5b 2400 task=AllegroKukaReorientation headless=True \
    max_iterations=2000
run UsefulHound_r5 2400 task=UsefulHound headless=True max_iterations=2000
run ShadowHand_r5 2400 task=ShadowHand headless=True max_iterations=2000
run HoundTerrain_r5b 2400 task=HoundTerrain headless=True max_iterations=2000 \
    env.terrain.terrainType=trimesh
run FrankaCubeStack_r5b 1200 task=FrankaCubeStack headless=True max_iterations=1500
run Ant_r5b 1200 task=Ant headless=True max_iterations=1000
run AllegroHandDextremeManualDR_r5 1800 task=AllegroHandDextremeManualDR \
    headless=True max_iterations=1200 num_envs=8192
echo "master training queue done"

wait_tpu
timeout 1800 python scripts/validate_fused_shadowhand.py 4096 \
    > runs/logs/shadowhand_xla_bench.log 2>&1
wait_tpu
timeout 1800 python scripts/amp_imitation_metric.py \
    runs/HumanoidAMPBackflip_r5/nn/HumanoidAMPBackflip_r5_best.ckpt \
    amp_humanoid_backflip.npy > runs/logs/amp_backflip_metric.log 2>&1 || true
wait_tpu
timeout 1200 python bench.py > runs/logs/bench_r5.log 2>&1
echo "master queue benches done"
