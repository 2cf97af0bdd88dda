#!/usr/bin/env python
"""Build train/val/test annotation file lists for a benchmark dataset.

Reference: tools/data/build_file_list.py:1-262. Scans a rawframes or
videos tree, joins it with the dataset's official split annotations
(tools/data/file_lists.py parsers) and writes the ``*_list_*.txt`` /
``.json`` files the dataset configs consume.

Usage:
    python tools/data/build_file_list.py ucf101 data/ucf101/rawframes \
        --data-root data/ucf101 --format rawframes --level 2
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))

from tools.data.file_lists import (SPLIT_PARSERS, format_lines,  # noqa: E402
                                   lines_to_records, parse_directory,
                                   scan_videos)

SUBSET_NAMES = ('train', 'val', 'test')


def parse_args():
    parser = argparse.ArgumentParser(description='Build file list')
    parser.add_argument('dataset', choices=sorted(SPLIT_PARSERS))
    parser.add_argument('src_folder',
                        help='root of the rawframes or videos tree')
    parser.add_argument('--data-root', default=None,
                        help='dataset root holding annotations/ '
                             '(default: data/DATASET)')
    parser.add_argument('--format', default='rawframes',
                        choices=['rawframes', 'videos'])
    parser.add_argument('--level', type=int, default=2, choices=[1, 2])
    parser.add_argument('--rgb-prefix', default='img_')
    parser.add_argument('--flow-x-prefix', default='flow_x_')
    parser.add_argument('--flow-y-prefix', default='flow_y_')
    parser.add_argument('--output-format', default='txt',
                        choices=['txt', 'json'])
    parser.add_argument('--out-root-path', default='data/',
                        help='output directory root (files land in '
                             'OUT_ROOT/DATASET/)')
    parser.add_argument('--shuffle', action='store_true')
    parser.add_argument('--seed', type=int, default=0)
    return parser.parse_args()


def write_list(lines, out_dir, name, output_format, fmt):
    os.makedirs(out_dir, exist_ok=True)
    path = osp.join(out_dir, name)
    if output_format == 'txt':
        with open(path, 'w') as f:
            f.writelines(lines)
    else:
        path = path.replace('.txt', '.json')
        with open(path, 'w') as f:
            json.dump(lines_to_records(lines, fmt), f)
    print(f'wrote {path} ({len(lines)} items)')


def main():
    args = parse_args()
    data_root = args.data_root or osp.join('data', args.dataset)

    if args.format == 'rawframes':
        frame_info = parse_directory(
            args.src_folder, rgb_prefix=args.rgb_prefix,
            flow_x_prefix=args.flow_x_prefix,
            flow_y_prefix=args.flow_y_prefix, level=args.level)
    else:
        frame_info = scan_videos(args.src_folder, level=args.level)

    splits = SPLIT_PARSERS[args.dataset](data_root, level=args.level)
    out_dir = osp.join(args.out_root_path, args.dataset)
    multi_split = len(splits) > 1
    for si, split in enumerate(splits):
        for subset, items in zip(SUBSET_NAMES, split):
            lines = format_lines(items, frame_info, shuffle=args.shuffle,
                                 seed=args.seed)
            if multi_split:
                name = (f'{args.dataset}_{subset}_split_{si + 1}'
                        f'_{args.format}.txt')
            else:
                name = f'{args.dataset}_{subset}_list_{args.format}.txt'
            write_list(lines, out_dir, name, args.output_format, args.format)


if __name__ == '__main__':
    main()
