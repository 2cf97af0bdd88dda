#!/usr/bin/env bash
# Moments in Time (reference tools/data/mit/*): request access at
# moments.csail.mit.edu, place Moments_in_Time_Raw under data/mit (videos
# in training/ and validation/ class dirs, csvs + moments_categories.txt
# under annotations/), then run this.
set -e
DATA_DIR=${1:-data/mit}
for split in training validation; do
  python tools/data/build_rawframes.py "${DATA_DIR}/videos/${split}" \
      "${DATA_DIR}/rawframes/${split}" --level 2 --ext mp4 \
      --new-short 256 --num-worker "${NUM_WORKER:-8}"
done
python tools/data/build_file_list.py mit "${DATA_DIR}/rawframes/training" \
    --data-root "${DATA_DIR}" --format rawframes --level 2 \
    --out-root-path "$(dirname "${DATA_DIR}")/"
