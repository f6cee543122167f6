#!/bin/bash
# Round-5 flag ours-HGN seed-variance ablation (VERDICT r4 #7).
# Seed 2 is the outlier cell (final/last-3 bands 2-3x wider than ref-HGN,
# BENCHMARKS.md:84-92); each run flips ONE variable vs the shipped run:
#   hyper_noise0 | f32 | kmeans   (see tools/control_flag.py:_ablate)
# Resumable: completed cells are skipped by their "wrote " log marker.
# Run AFTER tools/run_controls_r5_tpu.sh (single-chip TPU; one job at a time).
set -u
cd "$(dirname "$0")/.."
mkdir -p control_out/logs
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
export LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=32768

if ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "[ablate] TPU tunnel down (device probe timed out) — not starting"
  exit 3
fi

for mode in hyper_noise0 f32 kmeans; do
  for seed in 2 0 1; do
    log="control_out/logs/flag_ours-hgn_s${seed}_ab_${mode}.log"
    if grep -q "^wrote " "$log" 2>/dev/null; then
      echo "[ablate] skip $mode s$seed (done)"; continue
    fi
    echo "[ablate] flag ours-hgn seed=$seed ablate=$mode -> $log"
    CONTROL_ABLATE=$mode CONTROL_TAG="ab_${mode}" \
    timeout 2400 python tools/control_flag.py ours-hgn \
      --seed "$seed" --shipped >"$log" 2>&1 \
      || echo "[ablate] FAILED rc=$? $mode s$seed" | tee -a "$log"
  done
done
echo "[ablate] r5 ablation queue done"
