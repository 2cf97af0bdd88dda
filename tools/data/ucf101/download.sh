#!/usr/bin/env bash
# UCF-101 videos + split annotations into data/ucf101
# (reference tools/data/ucf101/download_{annotations,videos}.sh).
set -e
DATA_DIR=${1:-data/ucf101}
mkdir -p "${DATA_DIR}/annotations"

(
  cd "${DATA_DIR}/annotations"
  wget -c https://www.crcv.ucf.edu/wp-content/uploads/2019/03/UCF101TrainTestSplits-RecognitionTask.zip --no-check-certificate
  unzip -oj UCF101TrainTestSplits-RecognitionTask.zip && rm -f UCF101TrainTestSplits-RecognitionTask.zip
)

(
  cd "${DATA_DIR}"
  wget -c https://www.crcv.ucf.edu/datasets/human-actions/ucf101/UCF101.rar --no-check-certificate
  unrar x -o+ UCF101.rar && rm -f UCF101.rar
  [ -d UCF-101 ] && mv UCF-101 videos
)
echo "UCF-101 ready under ${DATA_DIR}"
