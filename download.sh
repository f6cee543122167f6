#!/bin/bash
# Download the DeepMind MeshGraphNets datasets (reference download.sh parity).
# Usage: ./download.sh <flag_simple|flag_minimal|cylinder_flow|deforming_plate> [output_dir]
# When the files are absent the framework falls back to synthetic data with
# the same schema, so this download is optional for development.
set -e
DATASET=${1:-flag_simple}
OUTPUT_DIR=${2:-data}
BASE_URL="https://storage.googleapis.com/dm-meshgraphnets"
DIR="${OUTPUT_DIR}/${DATASET}/input"
mkdir -p "${DIR}"
for file in meta.json train.tfrecord valid.tfrecord test.tfrecord; do
  echo "downloading ${DATASET}/${file}"
  wget -O "${DIR}/${file}" "${BASE_URL}/${DATASET}/${file}"
done
echo "done: ${DIR}"
