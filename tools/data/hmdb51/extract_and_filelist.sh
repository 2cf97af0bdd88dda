#!/usr/bin/env bash
# Extract RGB rawframes and build the 3 official file lists
# (reference tools/data/hmdb51/{extract_rgb_frames*,generate_*_filelist}.sh).
# Run from the repo root.
set -e
DATA_DIR=${1:-data/hmdb51}
python tools/data/build_rawframes.py "${DATA_DIR}/videos" \
    "${DATA_DIR}/rawframes" --level 2 --ext avi --new-short 256 \
    --num-worker "${NUM_WORKER:-8}"
python tools/data/build_file_list.py hmdb51 "${DATA_DIR}/rawframes" \
    --data-root "${DATA_DIR}" --format rawframes --level 2 \
    --out-root-path "$(dirname "${DATA_DIR}")/"
python tools/data/build_file_list.py hmdb51 "${DATA_DIR}/videos" \
    --data-root "${DATA_DIR}" --format videos --level 2 \
    --out-root-path "$(dirname "${DATA_DIR}")/"
