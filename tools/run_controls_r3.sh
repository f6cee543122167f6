#!/bin/bash
# Round-3 multi-seed control queues (VERDICT item 5).
#   tpu: "ours" cells, shipped numerics (bf16 + fused), 3 seeds, serialized
#        (one TPU chip).
#   cpu: reference cells, seeds 1,2 (seed 0 exists from round 2), torch CPU.
# Usage: tools/run_controls_r3.sh <tpu|cpu>
set -u
cd "$(dirname "$0")/.."
mkdir -p control_out/logs

case "${1-}" in
  tpu)
    for sys in plate flag cylinder; do
      for run in ours-mgn ours-hgn; do
        for seed in 0 1 2; do
          log="control_out/logs/${sys}_${run}_s${seed}_shipped.log"
          echo "[queue] $sys $run seed=$seed shipped -> $log"
          timeout 2400 python "tools/control_${sys}.py" "$run" \
            --seed "$seed" --shipped >"$log" 2>&1 \
            || echo "[queue] FAILED rc=$? $sys $run s$seed" | tee -a "$log"
        done
      done
    done
    echo "[queue] tpu queue done"
    ;;
  cpu)
    jobs_list=()
    for sys in plate flag; do
      for run in ref-mgn ref-hgn; do
        for seed in 1 2; do jobs_list+=("$sys $run $seed"); done
      done
    done
    for seed in 1 2; do jobs_list+=("cylinder ref-mgn $seed"); done
    # 2-way parallel, 2 OMP threads each (4 cores total)
    printf '%s\n' "${jobs_list[@]}" | xargs -P 2 -I{} bash -c '
      set -- {}
      log="control_out/logs/${1}_${2}_s${3}.log"
      echo "[queue] $1 $2 seed=$3 -> $log"
      OMP_NUM_THREADS=2 timeout 3600 python "tools/control_${1}.py" "$2" \
        --seed "$3" >"$log" 2>&1 \
        || echo "[queue] FAILED rc=$? $1 $2 s$3" | tee -a "$log"
    '
    echo "[queue] cpu queue done"
    ;;
  big)
    # large-mesh tier (VERDICT item 5 "meshes >= 1k nodes"): plate at
    # NX=32 (1024 plate nodes + obstacle), 4 epochs, 6 train trajs.
    # ours on TPU (shipped numerics, 3 seeds - cheap there); reference
    # torch-CPU at 1 seed (~105 s/epoch MGN; HGN per probe log).
    export CONTROL_NX=32 CONTROL_T=30 CONTROL_NTRAIN=6 CONTROL_EPOCHS=4
    export CONTROL_TAG=big
    for run in ours-mgn ours-hgn; do
      for seed in 0 1 2; do
        log="control_out/logs/plate_${run}_s${seed}_shipped_big.log"
        echo "[queue] big plate $run seed=$seed shipped -> $log"
        timeout 3000 python tools/control_plate.py "$run" \
          --seed "$seed" --shipped >"$log" 2>&1 \
          || echo "[queue] FAILED rc=$? big $run s$seed" | tee -a "$log"
      done
    done
    for run in ref-mgn ref-hgn; do
      log="control_out/logs/plate_${run}_s0_big.log"
      echo "[queue] big plate $run seed=0 -> $log"
      OMP_NUM_THREADS=4 timeout 5400 python tools/control_plate.py "$run" \
        --seed 0 >"$log" 2>&1 \
        || echo "[queue] FAILED rc=$? big $run s0" | tee -a "$log"
    done
    echo "[queue] big queue done"
    ;;
  *) echo "usage: $0 <tpu|cpu|big>"; exit 2;;
esac
