#!/usr/bin/env bash
# Multi-host launcher (ref: tools/dist_train.sh).
# GSPMD drives all local chips from ONE process; for multi-host slices run
# this once per host (jax.distributed auto-initializes from the TPU env).
CONFIG=$1
shift
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
