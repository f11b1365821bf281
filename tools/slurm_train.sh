#!/usr/bin/env bash
# SLURM launcher (ref: tools/slurm_train.sh): one task per host; JAX
# coordinates over the TPU fabric / jax.distributed.
#
# Usage: ./tools/slurm_train.sh PARTITION JOB_NAME CONFIG [ARGS...]
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
srun -p "${PARTITION}" --job-name="${JOB_NAME}" --ntasks-per-node=1 \
    python "$(dirname "$0")/train.py" "${CONFIG}" "$@"
