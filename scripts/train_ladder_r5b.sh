#!/bin/bash
# Round-5 ladder part 2: manipulation/OSC family learning evidence
# (VERDICT r4 weak #5 — zero curves for this family) + HumanoidAMP backflip
# imitation (verdict #8).  Runs after part 1 (terrain retrain) finishes.
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
run Houndarm_r5 1200 task=Houndarm headless=True max_iterations=1500
run FrankaCubeStack_r5 1200 task=FrankaCubeStack headless=True max_iterations=1500
run AllegroKukaReorientation_r5 2400 task=AllegroKukaReorientation headless=True \
    max_iterations=2000
run HumanoidAMPBackflip_r5 2400 task=HumanoidAMP headless=True max_iterations=2500 \
    env.motion_file=amp_humanoid_backflip.npy
echo "ladder r5 part2 done"
