#!/bin/bash
# Multi-host TPU pod-slice launcher: run this same script on every host of
# the slice (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`).
# jax.distributed picks up the pod topology from the TPU environment; the
# framework's data-parallel axis spans hosts, the graph (edge-parallel)
# axis spans the chips within each host over ICI.
# Usage: ./launch/tpu_pod_train.sh <config-name>
set -e
CONFIG=${1:?usage: tpu_pod_train.sh <config-name>}
cd "$(dirname "$0")/.."
python - "$CONFIG" <<'PY'
import sys
import jax
jax.distributed.initialize()  # no-op on single host
import main
sys.exit(main.main([sys.argv[1]]))
PY
