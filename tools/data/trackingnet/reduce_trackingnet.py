#!/usr/bin/env python
"""Temporally subsample TrackingNet frame sequences (reference:
tools/data/trackingnet/reduce_trackingnet.py — a stub there; implemented
here). TrackingNet stores one jpg per frame at 30 fps; SiamFC pair
sampling never needs that density, so keeping every ``stride``-th frame
cuts disk by ~10x. Writes a reduced tree of hardlinks/symlinks (or
deletes in place with --in-place) and rewrites the per-sequence
``anno/*.txt`` box files to the kept rows.
"""

import argparse
import glob
import os
import os.path as osp


def parse_args():
    parser = argparse.ArgumentParser(description='Reduce TrackingNet frames')
    parser.add_argument('src_folder',
                        help='a TrackingNet chunk dir holding frames/ and '
                             'anno/')
    parser.add_argument('--stride', type=int, default=10)
    parser.add_argument('--out', default=None,
                        help='output chunk dir (default: SRC_reduced)')
    parser.add_argument('--in-place', action='store_true',
                        help='delete dropped frames instead of linking '
                             'kept ones into --out')
    return parser.parse_args()


def frame_index(path):
    return int(osp.splitext(osp.basename(path))[0])


def main():
    args = parse_args()
    frames_root = osp.join(args.src_folder, 'frames')
    anno_root = osp.join(args.src_folder, 'anno')
    out_root = args.out or (args.src_folder.rstrip('/') + '_reduced')
    seqs = sorted(d for d in glob.glob(osp.join(frames_root, '*'))
                  if osp.isdir(d))
    print(f'{len(seqs)} sequences, stride {args.stride}')
    for seq_dir in seqs:
        seq = osp.basename(seq_dir)
        frames = sorted(glob.glob(osp.join(seq_dir, '*.jpg')),
                        key=frame_index)
        keep = frames[::args.stride]
        if args.in_place:
            for f in set(frames) - set(keep):
                os.remove(f)
        else:
            out_seq = osp.join(out_root, 'frames', seq)
            os.makedirs(out_seq, exist_ok=True)
            for new_idx, f in enumerate(keep):
                dst = osp.join(out_seq, f'{new_idx}.jpg')
                if not osp.exists(dst):
                    try:
                        os.link(f, dst)
                    except OSError:
                        os.symlink(osp.abspath(f), dst)
        anno_file = osp.join(anno_root, seq + '.txt')
        if osp.isfile(anno_file):
            with open(anno_file) as f:
                rows = f.readlines()
            kept_rows = [rows[frame_index(f)] for f in keep
                         if frame_index(f) < len(rows)]
            out_anno = anno_file if args.in_place else osp.join(
                out_root, 'anno', seq + '.txt')
            os.makedirs(osp.dirname(out_anno), exist_ok=True)
            with open(out_anno, 'w') as f:
                f.writelines(kept_rows)
    print(f'done -> {args.src_folder if args.in_place else out_root}')


if __name__ == '__main__':
    main()
