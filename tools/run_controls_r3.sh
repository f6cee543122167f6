#!/bin/bash
# Round-3 multi-seed control queues (VERDICT item 5).
#   tpu: "ours" cells, shipped numerics (bf16 + fused), 3 seeds, serialized
#        (one TPU chip).
#   cpu: reference cells, seeds 1,2 (seed 0 exists from round 2), torch CPU.
# Usage: tools/run_controls_r3.sh <tpu|cpu>
set -u
cd "$(dirname "$0")/.."
mkdir -p control_out/logs

case "$1" in
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
  *) echo "usage: $0 <tpu|cpu>"; exit 2;;
esac
