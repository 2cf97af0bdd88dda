#!/usr/bin/env bash
# Download DAVIS 2017 (trainval, 480p) into data/davis
# (reference tools/data layout).
DATA_DIR=${1:-data/davis}
mkdir -p "${DATA_DIR}"
cd "${DATA_DIR}"
wget -c https://data.vision.ee.ethz.ch/csergi/share/davis/DAVIS-2017-trainval-480p.zip
unzip -q DAVIS-2017-trainval-480p.zip
# build the rawframes list the configs expect
python - <<'PY'
import os
root = 'DAVIS'
lists_dir = os.path.join(root, 'ImageSets')
val_txt = os.path.join(lists_dir, '2017', 'val.txt')
out = os.path.join(lists_dir, 'davis2017_val_list_rawframes.txt')
with open(val_txt) as f, open(out, 'w') as g:
    for name in f.read().split():
        frames = len(os.listdir(os.path.join(root, 'JPEGImages/480p', name)))
        g.write(f'{name} {frames} 0\n')
print('wrote', out)
PY
