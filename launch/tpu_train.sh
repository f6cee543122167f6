#!/bin/bash
# Single-host TPU training launcher (replaces the reference's SLURM srun
# wrappers job_flag.sh / job_plate.sh / job_cylinder.sh — reference runs
# `srun python main.py $CONFIG`; on a TPU VM the equivalent is direct).
# Usage: ./launch/tpu_train.sh <config-name>
set -e
CONFIG=${1:?usage: tpu_train.sh <config-name>}
cd "$(dirname "$0")/.."
# larger scoped-VMEM limit lets the fused MP-block kernel use 512-edge
# chunks (ops/pallas/fused_block.default_chunk)
export LIBTPU_INIT_ARGS=${LIBTPU_INIT_ARGS:---xla_tpu_scoped_vmem_limit_kib=32768}
python main.py "${CONFIG}"
