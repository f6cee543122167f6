#!/bin/bash
# Round-4 plate control re-runs: the plate generator now produces REAL
# contact (world edges live for the first time — data/synthetic.py round-4
# change), so every plate cell re-runs on the new data; flag/cylinder
# generators are untouched and their round-3 tables stand.
#   cpu: torch reference cells, 3 seeds, 2-way parallel (4 cores).
#   tpu: "ours" cells, shipped numerics (bf16 + fused + auto world cap),
#        3 seeds, serialized (one chip).
#   big: large-mesh tier (NX=32), ours 3 seeds TPU + ref seed 0 CPU.
# Usage: tools/run_controls_r4.sh <cpu|tpu|big>
set -u
cd "$(dirname "$0")/.."
mkdir -p control_out/logs

case "${1-}" in
  cpu)
    jobs_list=()
    for run in ref-mgn ref-hgn; do
      for seed in 0 1 2; do jobs_list+=("$run $seed"); done
    done
    printf '%s\n' "${jobs_list[@]}" | xargs -P 2 -I{} bash -c '
      set -- {}
      log="control_out/logs/plate_${1}_s${2}_r4.log"
      echo "[queue] plate $1 seed=$2 -> $log"
      OMP_NUM_THREADS=2 timeout 3600 python tools/control_plate.py "$1" \
        --seed "$2" >"$log" 2>&1 \
        || echo "[queue] FAILED rc=$? plate $1 s$2" | tee -a "$log"
    '
    echo "[queue] r4 cpu queue done"
    ;;
  tpu)
    for run in ours-mgn ours-hgn; do
      for seed in 0 1 2; do
        log="control_out/logs/plate_${run}_s${seed}_shipped_r4.log"
        echo "[queue] plate $run seed=$seed shipped -> $log"
        timeout 2400 python tools/control_plate.py "$run" \
          --seed "$seed" --shipped >"$log" 2>&1 \
          || echo "[queue] FAILED rc=$? plate $run s$seed" | tee -a "$log"
      done
    done
    echo "[queue] r4 tpu queue done"
    ;;
  big)
    export CONTROL_NX=32 CONTROL_T=30 CONTROL_NTRAIN=6 CONTROL_EPOCHS=4
    export CONTROL_TAG=big
    for run in ours-mgn ours-hgn; do
      for seed in 0 1 2; do
        log="control_out/logs/plate_${run}_s${seed}_shipped_big_r4.log"
        echo "[queue] big plate $run seed=$seed shipped -> $log"
        timeout 3000 python tools/control_plate.py "$run" \
          --seed "$seed" --shipped >"$log" 2>&1 \
          || echo "[queue] FAILED rc=$? big $run s$seed" | tee -a "$log"
      done
    done
    for run in ref-mgn ref-hgn; do
      log="control_out/logs/plate_${run}_s0_big_r4.log"
      echo "[queue] big plate $run seed=0 -> $log"
      OMP_NUM_THREADS=4 timeout 5400 python tools/control_plate.py "$run" \
        --seed 0 >"$log" 2>&1 \
        || echo "[queue] FAILED rc=$? big $run s0" | tee -a "$log"
    done
    echo "[queue] r4 big queue done"
    ;;
  *) echo "usage: $0 <cpu|tpu|big>"; exit 2;;
esac
