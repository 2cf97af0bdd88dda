#!/usr/bin/env bash
# GOT-10k train split for SiamFC linear probing (reference uses the got10k
# toolkit's layout: <root>/<seq>/*.jpg + groundtruth.txt).
DATA_DIR=${1:-data/got10k}
mkdir -p "${DATA_DIR}"
echo "Download from http://got-10k.aitestunion.com/downloads and unzip the"
echo "train split into ${DATA_DIR}/train"
