#!/usr/bin/env python
"""Re-encode rawframe directories back into videos (reference:
tools/data/build_videos.py:1-126 — ffmpeg-driven there too; this version
shells out to the ffmpeg CLI over a process pool).

Usage:
    python tools/data/build_videos.py data/sthv1/rawframes \
        data/sthv1/videos --level 1 --fps 12
"""

import argparse
import glob
import os
import os.path as osp
import subprocess
import sys
from multiprocessing import Pool


def parse_args():
    parser = argparse.ArgumentParser(description='Encode rawframes to video')
    parser.add_argument('src_dir', help='rawframes source directory')
    parser.add_argument('out_dir', help='video output directory')
    parser.add_argument('--level', type=int, default=2, choices=[1, 2])
    parser.add_argument('--fps', type=int, default=30)
    parser.add_argument('--ext', default='mp4')
    parser.add_argument('--filename-tmpl', default='img_%05d.jpg')
    parser.add_argument('--start-index', type=int, default=1)
    parser.add_argument('--num-worker', type=int, default=8)
    return parser.parse_args()


def encode_one(task):
    frame_dir, out_path, fps, tmpl, start = task
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    cmd = ['ffmpeg', '-y', '-loglevel', 'error', '-framerate', str(fps),
           '-start_number', str(start),
           '-i', osp.join(frame_dir, tmpl),
           '-c:v', 'libx264', '-pix_fmt', 'yuv420p', out_path]
    rc = subprocess.run(cmd, capture_output=True).returncode
    return out_path, rc


def main():
    args = parse_args()
    pattern = osp.join(args.src_dir, *(['*'] * args.level))
    frame_dirs = sorted(d for d in glob.glob(pattern) if osp.isdir(d))
    print(f'{len(frame_dirs)} frame directories under {args.src_dir}')
    tasks = []
    for d in frame_dirs:
        rel = osp.relpath(d, args.src_dir)
        tasks.append((d, osp.join(args.out_dir, rel + '.' + args.ext),
                      args.fps, args.filename_tmpl, args.start_index))
    failed = 0
    with Pool(args.num_worker) as pool:
        for i, (path, rc) in enumerate(pool.imap_unordered(encode_one,
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
