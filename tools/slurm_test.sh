#!/usr/bin/env bash
# SLURM evaluation launcher (ref: tools/slurm_test.sh).
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4
srun -p "${PARTITION}" --job-name="${JOB_NAME}" --ntasks-per-node=1 \
    python "$(dirname "$0")/test.py" "${CONFIG}" "${CHECKPOINT}" "$@"
