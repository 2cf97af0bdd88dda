#!/usr/bin/env bash
# Something-Something V2 (reference tools/data/sthv2/*): obtain the .webm
# videos + json annotations from 20bn (registration required) into
# data/sthv2/{videos,annotations}, then run this to extract rawframes and
# build the file lists.
set -e
DATA_DIR=${1:-data/sthv2}
python tools/data/build_rawframes.py "${DATA_DIR}/videos" \
    "${DATA_DIR}/rawframes" --level 1 --ext webm --new-short 256 \
    --num-worker "${NUM_WORKER:-8}"
python tools/data/build_file_list.py sthv2 "${DATA_DIR}/rawframes" \
    --data-root "${DATA_DIR}" --format rawframes --level 1 \
    --out-root-path "$(dirname "${DATA_DIR}")/"
python tools/data/build_file_list.py sthv2 "${DATA_DIR}/videos" \
    --data-root "${DATA_DIR}" --format videos --level 1 \
    --out-root-path "$(dirname "${DATA_DIR}")/"
