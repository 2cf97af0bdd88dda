#!/usr/bin/env python
"""Split the BSN ActivityNet annotation json by subset (reference:
tools/data/activitynet/process_annotations.py:1-56): joins
``anet_anno_action.json`` with the fps/subset columns of
``video_info_new.csv`` and writes anet_anno_{train,val,test,full}.json —
the files ActivityNetDataset consumes.
"""

import argparse
import csv
import json
import os.path as osp


def main():
    parser = argparse.ArgumentParser(
        description='Split ActivityNet annotations by subset')
    parser.add_argument('--data-root', default='data/ActivityNet')
    args = parser.parse_args()

    with open(osp.join(args.data_root, 'anet_anno_action.json')) as f:
        anno = json.load(f)

    subsets = dict(training={}, validation={}, testing={})
    full = {}
    with open(osp.join(args.data_root, 'video_info_new.csv')) as f:
        for row in csv.DictReader(f):
            name = row['video']
            info = dict(anno[name])
            info['fps'] = float(row['fps'])
            info['rfps'] = float(row['rfps'])
            full[name] = info
            subsets.setdefault(row['subset'], {})[name] = info

    out_names = dict(training='anet_anno_train.json',
                     validation='anet_anno_val.json',
                     testing='anet_anno_test.json')
    for subset, records in subsets.items():
        if subset not in out_names:
            continue
        path = osp.join(args.data_root, out_names[subset])
        with open(path, 'w') as f:
            json.dump(records, f)
        print(f'wrote {path} ({len(records)} videos)')
    path = osp.join(args.data_root, 'anet_anno_full.json')
    with open(path, 'w') as f:
        json.dump(full, f)
    print(f'wrote {path} ({len(full)} videos)')


if __name__ == '__main__':
    main()
