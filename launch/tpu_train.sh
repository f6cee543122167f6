#!/bin/bash
# Single-host TPU training launcher (replaces the reference's SLURM srun
# wrappers job_flag.sh / job_plate.sh / job_cylinder.sh — reference runs
# `srun python main.py $CONFIG`; on a TPU VM the equivalent is direct).
# Usage: ./launch/tpu_train.sh <config-name>
set -e
CONFIG=${1:?usage: tpu_train.sh <config-name>}
cd "$(dirname "$0")/.."
python main.py "${CONFIG}"
