#!/usr/bin/env bash
# SLURM launcher (reference tools/slurm_train.sh). One task per host;
# jax.distributed discovers peers through the SLURM env.
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
GPUS_PER_NODE=${GPUS_PER_NODE:-1}
SRUN_ARGS=${SRUN_ARGS:-""}
shift 3
srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python tools/train.py "${CONFIG}" --launcher jax "$@"
