#!/usr/bin/env bash
# Multi-host evaluation launcher (ref: tools/dist_test.sh).  One process
# drives all local chips; run once per host for pod slices.
CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
