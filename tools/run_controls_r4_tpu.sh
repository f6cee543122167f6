#!/bin/bash
# Round-4 "ours" plate control cells (TPU, shipped numerics) — outage-aware
# variant: probes the tunnel first (it has multi-minute outages; see
# bench.py) and shares the persistent compilation cache so the six cells
# compile once.  Usage: tools/run_controls_r4_tpu.sh [big]
set -u
cd "$(dirname "$0")/.."
mkdir -p control_out/logs
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

if ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "[queue] TPU tunnel down (device probe timed out) — not starting"
  exit 3
fi

tag=""
if [ "${1:-}" = big ]; then
  export CONTROL_NX=32 CONTROL_T=30 CONTROL_NTRAIN=6 CONTROL_EPOCHS=4
  export CONTROL_TAG=big
  tag="_big"
fi
for run in ours-mgn ours-hgn; do
  for seed in 0 1 2; do
    log="control_out/logs/plate_${run}_s${seed}_shipped${tag}_r4.log"
    if grep -q "^wrote " "$log" 2>/dev/null; then
      echo "[queue] skip $run s$seed (done)"; continue
    fi
    echo "[queue] plate $run seed=$seed shipped$tag -> $log"
    timeout 2400 python tools/control_plate.py "$run" \
      --seed "$seed" --shipped >"$log" 2>&1 \
      || echo "[queue] FAILED rc=$? plate $run s$seed$tag" | tee -a "$log"
  done
done
echo "[queue] r4 tpu$tag queue done"
