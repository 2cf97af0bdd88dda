#!/usr/bin/env bash
# ActivityNet-1.3 BSN/BMN assets into data/ActivityNet (reference
# tools/data/activitynet/download_{annotations,features}.sh): the action
# annotations + video info csv from the BSN release, plus the rescaled
# (100-snippet) TSN feature archive.
set -e
DATA_DIR=${1:-data/ActivityNet}
mkdir -p "${DATA_DIR}"
(
  cd "${DATA_DIR}"
  wget -c https://raw.githubusercontent.com/wzmsltw/BSN-boundary-sensitive-network/master/data/activitynet_annotations/anet_anno_action.json
  wget -c https://raw.githubusercontent.com/wzmsltw/BSN-boundary-sensitive-network/master/data/activitynet_annotations/video_info_new.csv
  # csv features (one file per video, 100 rows x 400 dims), ~5.5 GB
  wget -c https://open-mmlab.s3.ap-northeast-2.amazonaws.com/mmaction/localization/bsn/activitynet_feature_cuhk.tar.gz || \
    echo "feature archive unavailable; extract features with tools/data/activitynet/tsn_feature_extraction.py instead"
  [ -f activitynet_feature_cuhk.tar.gz ] && tar -xzf activitynet_feature_cuhk.tar.gz
)
python tools/data/activitynet/process_annotations.py --data-root "${DATA_DIR}"
