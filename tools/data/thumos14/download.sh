#!/usr/bin/env bash
# THUMOS-14 videos + annotations + TAG proposals into data/thumos14
# (reference tools/data/thumos14/{download_*,fetch_tag_proposals}.sh).
set -e
DATA_DIR=${1:-data/thumos14}
mkdir -p "${DATA_DIR}/annotations" "${DATA_DIR}/videos/val" \
         "${DATA_DIR}/videos/test" "${DATA_DIR}/proposals"

(
  cd "${DATA_DIR}"
  wget -c https://storage.googleapis.com/thumos14_files/TH14_validation_set_mp4.zip
  unzip -n -j TH14_validation_set_mp4.zip -d videos/val
  wget -c https://storage.googleapis.com/thumos14_files/TH14_Test_set_mp4.zip
  unzip -n -P "THUMOS14_REGISTERED" TH14_Test_set_mp4.zip -d videos/test
  cd annotations
  wget -c http://crcv.ucf.edu/THUMOS14/Validation_set/TH14_Temporal_annotations_validation.zip --no-check-certificate
  unzip -n TH14_Temporal_annotations_validation.zip
  wget -c http://crcv.ucf.edu/THUMOS14/test_set/TH14_Temporal_annotations_test.zip --no-check-certificate
  unzip -n TH14_Temporal_annotations_test.zip
)

# normalized TAG proposal lists for SSN (reference fetch_tag_proposals.sh)
wget -c -P "${DATA_DIR}/proposals" \
  https://open-mmlab.s3.ap-northeast-2.amazonaws.com/mmaction/filelist/thumos14_tag_val_normalized_proposal_list.txt
wget -c -P "${DATA_DIR}/proposals" \
  https://open-mmlab.s3.ap-northeast-2.amazonaws.com/mmaction/filelist/thumos14_tag_test_normalized_proposal_list.txt
echo "THUMOS-14 ready under ${DATA_DIR}"
