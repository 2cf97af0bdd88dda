#!/usr/bin/env bash
# Something-Something V1 (reference tools/data/sthv1/*): the dataset ships
# as rawframe archives + csv annotations from 20bn (registration
# required) — place the extracted frame dirs under data/sthv1/rawframes
# and the csvs under data/sthv1/annotations, then run this to build the
# file lists (and optionally encode videos for the VideoDataset path).
set -e
DATA_DIR=${1:-data/sthv1}
python tools/data/build_file_list.py sthv1 "${DATA_DIR}/rawframes" \
    --data-root "${DATA_DIR}" --format rawframes --level 1 \
    --rgb-prefix '' --out-root-path "$(dirname "${DATA_DIR}")/"
if [ "${ENCODE_VIDEOS:-0}" = "1" ]; then
  # reference encode_videos.sh equivalent
  python tools/data/build_videos.py "${DATA_DIR}/rawframes" \
      "${DATA_DIR}/videos" --level 1 --fps 12 --filename-tmpl '%05d.jpg'
  python tools/data/build_file_list.py sthv1 "${DATA_DIR}/videos" \
      --data-root "${DATA_DIR}" --format videos --level 1 \
      --out-root-path "$(dirname "${DATA_DIR}")/"
fi
