#!/usr/bin/env bash
# HMDB-51 videos + split annotations into data/hmdb51
# (reference tools/data/hmdb51/download_{annotations,videos}.sh; same
# upstream URLs, run from the repo root with an optional target dir).
set -e
DATA_DIR=${1:-data/hmdb51}
mkdir -p "${DATA_DIR}/annotations" "${DATA_DIR}/videos"

(
  cd "${DATA_DIR}/annotations"
  wget -c http://serre-lab.clps.brown.edu/wp-content/uploads/2013/10/test_train_splits.rar --no-check-certificate
  unrar x -o+ test_train_splits.rar
  mv -f testTrainMulti_7030_splits/*.txt ./ && rmdir testTrainMulti_7030_splits
  rm -f test_train_splits.rar
)

(
  cd "${DATA_DIR}/videos"
  wget -c http://serre-lab.clps.brown.edu/wp-content/uploads/2013/10/hmdb51_org.rar --no-check-certificate
  unrar x -o+ hmdb51_org.rar && rm -f hmdb51_org.rar
  for f in *.rar; do unrar x -o+ "$f" && rm -f "$f"; done
)
echo "HMDB-51 ready under ${DATA_DIR} (class dirs of .avi videos)"
