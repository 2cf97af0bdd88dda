#!/usr/bin/env bash
# Kinetics-400 post-download preparation (reference tools/data/kinetics400/
# {rename_classnames,extract_rgb_frames*,generate_*_filelist}.sh):
# normalize class-dir names, resize to short-side 256 for fast decode,
# optionally extract rawframes, and build the file lists. Assumes videos
# under DATA_DIR/videos_{train,val}/<class>/<vid>.mp4 and the official
# csvs under DATA_DIR/annotations (kinetics_{train,val,test}.csv).
set -e
DATA_DIR=${1:-data/kinetics400}

# rename classnames: spaces -> _, parens -> - (reference rename_classnames.sh)
for split in train val; do
  [ -d "${DATA_DIR}/videos_${split}" ] || continue
  ls "${DATA_DIR}/videos_${split}" | while read -r class; do
    newclass=$(echo "$class" | tr ' ' '_' | tr '(' '-' | tr ')' '-')
    if [ "$class" != "$newclass" ]; then
      mv "${DATA_DIR}/videos_${split}/${class}" \
         "${DATA_DIR}/videos_${split}/${newclass}"
    fi
  done
done

if [ "${RESIZE_256:-0}" = "1" ]; then
  python tools/data/resize_video.py "${DATA_DIR}/videos_train" \
      "${DATA_DIR}/videos_train_256" --short-side 256 --dense \
      --num-worker "${NUM_WORKER:-8}"
fi

if [ "${EXTRACT_FRAMES:-0}" = "1" ]; then
  for split in train val; do
    python tools/data/build_rawframes.py "${DATA_DIR}/videos_${split}" \
        "${DATA_DIR}/rawframes_${split}" --level 2 --ext mp4 \
        --new-short 256 --num-worker "${NUM_WORKER:-8}"
  done
fi

# file lists (the r18/r50 configs consume the train videos list). The
# builder scans one tree at a time; subset rows missing from the scanned
# tree are skipped, so run it once per split dir.
SRC_TRAIN="${DATA_DIR}/videos_train"
[ -d "${DATA_DIR}/videos_train_256" ] && SRC_TRAIN="${DATA_DIR}/videos_train_256"
python tools/data/build_file_list.py kinetics400 "${SRC_TRAIN}" \
    --data-root "${DATA_DIR}" --format videos --level 2 \
    --out-root-path "$(dirname "${DATA_DIR}")/"
