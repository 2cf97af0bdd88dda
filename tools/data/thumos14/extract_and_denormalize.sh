#!/usr/bin/env bash
# Extract rawframes for the val/test subsets and denormalize the TAG
# proposal files against them (reference tools/data/thumos14/
# {extract_rgb_frames*,denormalize_proposal_file}.sh).
set -e
DATA_DIR=${1:-data/thumos14}
for split in val test; do
  # THUMOS-14 proposal files refer to the subset dir names the reference
  # uses (validation/test)
  out=$([ "$split" = val ] && echo validation || echo test)
  python tools/data/build_rawframes.py "${DATA_DIR}/videos/${split}" \
      "${DATA_DIR}/rawframes/${out}" --level 1 --ext mp4 \
      --new-short 256 --num-worker "${NUM_WORKER:-8}"
  python tools/data/denormalize_proposal_file.py thumos14 \
      --norm-proposal-file \
      "${DATA_DIR}/proposals/thumos14_tag_${split}_normalized_proposal_list.txt" \
      --data-prefix "${DATA_DIR}/rawframes/${out}"
done
