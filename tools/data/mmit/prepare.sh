#!/usr/bin/env bash
# Multi-Moments in Time (reference tools/data/mmit/*): request access at
# moments.csail.mit.edu, place the videos + trainingSet/validationSet csvs
# under data/mmit/{videos,annotations}, then run this.
set -e
DATA_DIR=${1:-data/mmit}
python tools/data/build_rawframes.py "${DATA_DIR}/videos" \
    "${DATA_DIR}/rawframes" --level 2 --ext mp4 --new-short 256 \
    --num-worker "${NUM_WORKER:-8}"
python tools/data/build_file_list.py mmit "${DATA_DIR}/rawframes" \
    --data-root "${DATA_DIR}" --format rawframes --level 2 \
    --out-root-path "$(dirname "${DATA_DIR}")/"
