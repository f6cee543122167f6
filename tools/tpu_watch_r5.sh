#!/bin/bash
# Round-5 tunnel-recovery watcher: probe the axon TPU tunnel every 10 min;
# the moment it answers, run the round-5 TPU queue (resumable) and keep
# watching so a mid-queue outage resumes on the next recovery.
set -u
cd "$(dirname "$0")/.."
log=control_out/logs/watch_r5.log
mkdir -p control_out/logs
for i in $(seq 1 80); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[watch] $(date -u +%FT%TZ) tunnel UP (iter $i) — running queue" >>"$log"
    tools/run_controls_r5_tpu.sh >>"$log" 2>&1
    rc=$?
    echo "[watch] $(date -u +%FT%TZ) queue exited rc=$rc" >>"$log"
    done_cells=$(grep -l "^wrote " \
      control_out/logs/plate_ours-*_s*_shipped_r4.log \
      control_out/logs/plate_ours-*_s*_shipped_big15.log 2>/dev/null | wc -l)
    if [ "$done_cells" -ge 12 ] \
        && grep -q '"hgn_fresh": true' control_out/logs/bench_r5_fresh.log 2>/dev/null; then
      echo "[watch] $(date -u +%FT%TZ) all cells + fresh bench complete — exiting" >>"$log"
      exit 0
    fi
    sleep 120
  else
    echo "[watch] $(date -u +%FT%TZ) tunnel down (iter $i); sleep 600" >>"$log"
    sleep 600
  fi
done
echo "[watch] $(date -u +%FT%TZ) watcher budget exhausted" >>"$log"
