#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh used
# torch.distributed.launch; JAX uses one process per host and
# jax.distributed.initialize picks up the coordinator env).
#
# Single-host (all local TPU chips are used automatically by GSPMD):
#   ./tools/dist_train.sh CONFIG
# Multi-host (run once per host):
#   COORDINATOR_ADDRESS=host0:1234 NUM_PROCESSES=4 PROCESS_ID=$i \
#       ./tools/dist_train.sh CONFIG
CONFIG=$1
shift
if [ -n "$COORDINATOR_ADDRESS" ]; then
    exec python "$(dirname "$0")/train.py" "$CONFIG" --launcher jax "$@"
else
    exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
fi
