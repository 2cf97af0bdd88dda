#!/usr/bin/env bash
# Extract RGB rawframes and build the 3 official file lists
# (reference tools/data/ucf101/{extract_rgb_frames*,generate_*_filelist}.sh).
set -e
DATA_DIR=${1:-data/ucf101}
python tools/data/build_rawframes.py "${DATA_DIR}/videos" \
    "${DATA_DIR}/rawframes" --level 2 --ext avi --new-short 256 \
    --num-worker "${NUM_WORKER:-8}"
python tools/data/build_file_list.py ucf101 "${DATA_DIR}/rawframes" \
    --data-root "${DATA_DIR}" --format rawframes --level 2 \
    --out-root-path "$(dirname "${DATA_DIR}")/"
python tools/data/build_file_list.py ucf101 "${DATA_DIR}/videos" \
    --data-root "${DATA_DIR}" --format videos --level 2 \
    --out-root-path "$(dirname "${DATA_DIR}")/"
