#!/usr/bin/env bash
# Multi-host eval launcher (see dist_train.sh).
CONFIG=$1
CHECKPOINT=$2
shift 2
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
