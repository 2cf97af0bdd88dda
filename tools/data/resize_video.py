#!/usr/bin/env python
"""Resize a tree of videos so the short side is N pixels (reference:
tools/data/resize_video.py:1-121; kinetics preprocessing step). Uses the
ffmpeg CLI scale filter with -2 rounding to keep encoder-friendly even
dimensions; aspect ratio preserved.

Usage:
    python tools/data/resize_video.py data/kinetics400/videos_train \
        data/kinetics400/videos_train_256 --short-side 256 --num-worker 16
"""

import argparse
import glob
import os
import os.path as osp
import subprocess
import sys
from multiprocessing import Pool


def parse_args():
    parser = argparse.ArgumentParser(description='Resize videos')
    parser.add_argument('src_dir')
    parser.add_argument('out_dir')
    parser.add_argument('--short-side', type=int, default=256)
    parser.add_argument('--level', type=int, default=2, choices=[1, 2])
    parser.add_argument('--ext', default='mp4')
    parser.add_argument('--num-worker', type=int, default=8)
    parser.add_argument('--dense', action='store_true',
                        help='also force a dense keyframe interval '
                             '(-g 16) for fast random seeks')
    parser.add_argument('--remove-dup', action='store_true',
                        help='drop duplicated frames (mpdecimate)')
    return parser.parse_args()


def resize_one(task):
    src, dst, short, dense, remove_dup = task
    os.makedirs(osp.dirname(dst), exist_ok=True)
    # scale the SHORT side to `short`: scale=w:h with conditional expr
    vf = (f"scale='if(gt(iw,ih),-2,{short})':'if(gt(iw,ih),{short},-2)'")
    if remove_dup:
        vf = 'mpdecimate,' + vf
    cmd = ['ffmpeg', '-y', '-loglevel', 'error', '-i', src, '-vf', vf,
           '-c:v', 'libx264', '-pix_fmt', 'yuv420p']
    if remove_dup:
        cmd += ['-vsync', 'vfr']
    if dense:
        cmd += ['-g', '16']
    cmd += ['-c:a', 'copy', dst]
    rc = subprocess.run(cmd, capture_output=True).returncode
    return dst, rc


def main():
    args = parse_args()
    pattern = osp.join(args.src_dir, *(['*'] * (args.level - 1)),
                       f'*.{args.ext}')
    videos = sorted(glob.glob(pattern))
    print(f'{len(videos)} videos under {args.src_dir}')
    tasks = [(v, osp.join(args.out_dir, osp.relpath(v, args.src_dir)),
              args.short_side, args.dense, args.remove_dup) for v in videos]
    failed = 0
    with Pool(args.num_worker) as pool:
        for i, (path, rc) in enumerate(pool.imap_unordered(resize_one,
                                                           tasks)):
            if rc != 0:
                failed += 1
                print(f'FAILED {path}')
            elif (i + 1) % 100 == 0:
                print(f'[{i + 1}/{len(tasks)}] {path}')
    print(f'done; {failed} failures')
    if failed:
        sys.exit(1)


if __name__ == '__main__':
    main()
