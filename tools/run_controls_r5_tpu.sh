#!/bin/bash
# Round-5 TPU work queue — everything that needs the (outage-prone) tunnel,
# in verdict priority order:
#   1. fresh bench line incl. hgn_plate_* (VERDICT r4 #2) — also pre-warms
#      the persistent compile cache for the driver's own bench run
#   2. remaining 144-node contact control cells (VERDICT r4 #1)
#   3. big-tier (1024+81 nodes) 15-epoch converged contact cells, both
#      architectures x 3 seeds (VERDICT r4 #5)
# Resumable: completed cells are skipped by their "wrote " log marker.
# Usage: tools/run_controls_r5_tpu.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p control_out/logs
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
export LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=32768

if ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "[queue] TPU tunnel down (device probe timed out) — not starting"
  exit 3
fi

# ---- phase 1: fresh bench (HGN measured first when MGN is cached) --------
blog=control_out/logs/bench_r5_fresh.log
if grep -q '"hgn_fresh": true' "$blog" 2>/dev/null; then
  echo "[queue] skip bench (fresh hgn line already captured)"
else
  echo "[queue] bench.py (deadline 1800s) -> $blog"
  BENCH_DEADLINE_S=1800 timeout 2100 python bench.py >"$blog" 2>&1 \
    || echo "[queue] bench rc=$?" | tee -a "$blog"
fi

# ---- phase 2: 144-node contact cells (resume of the r4 queue) ------------
for run in ours-mgn ours-hgn; do
  for seed in 0 1 2; do
    log="control_out/logs/plate_${run}_s${seed}_shipped_r4.log"
    if grep -q "^wrote " "$log" 2>/dev/null; then
      echo "[queue] skip 144 $run s$seed (done)"; continue
    fi
    echo "[queue] plate144 $run seed=$seed shipped -> $log"
    timeout 2400 python tools/control_plate.py "$run" \
      --seed "$seed" --shipped >"$log" 2>&1 \
      || echo "[queue] FAILED rc=$? plate144 $run s$seed" | tee -a "$log"
  done
done

# ---- phase 3: converged big tier, 15 epochs, contact data -----------------
for run in ours-hgn ours-mgn; do
  for seed in 0 1 2; do
    log="control_out/logs/plate_${run}_s${seed}_shipped_big15.log"
    if grep -q "^wrote " "$log" 2>/dev/null; then
      echo "[queue] skip big15 $run s$seed (done)"; continue
    fi
    echo "[queue] big15 $run seed=$seed shipped -> $log"
    CONTROL_NX=32 CONTROL_T=30 CONTROL_NTRAIN=6 CONTROL_EPOCHS=15 \
    CONTROL_TAG=big15 \
    timeout 3600 python tools/control_plate.py "$run" \
      --seed "$seed" --shipped >"$log" 2>&1 \
      || echo "[queue] FAILED rc=$? big15 $run s$seed" | tee -a "$log"
  done
done
echo "[queue] r5 tpu queue done"
