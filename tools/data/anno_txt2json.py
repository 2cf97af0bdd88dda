#!/usr/bin/env python
"""Convert a txt annotation list to the json list format
(reference: tools/data/anno_txt2json.py:1-102).

Usage:
    python tools/data/anno_txt2json.py LIST.txt --format rawframes
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))

from tools.data.file_lists import lines_to_records  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='txt annotations -> json')
    parser.add_argument('annofile')
    parser.add_argument('--format', default='rawframes',
                        choices=['rawframes', 'videos'])
    parser.add_argument('--output', default=None)
    args = parser.parse_args()
    with open(args.annofile) as f:
        records = lines_to_records(f.readlines(), args.format)
    out = args.output or args.annofile.replace('.txt', '.json')
    with open(out, 'w') as f:
        json.dump(records, f)
    print(f'wrote {out} ({len(records)} records)')


if __name__ == '__main__':
    main()
