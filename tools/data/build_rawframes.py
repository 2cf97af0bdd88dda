#!/usr/bin/env python
"""Extract RGB rawframes from a tree of videos.

Reference: tools/data/build_rawframes.py:1-226 — there frames come from
denseflow (a GPU tool) or mmcv/OpenCV; here decode goes through the
in-repo native FFmpeg decoder (vfs_tpu/native/video_decoder.cpp) with a
cv2 fallback, parallelised over a process pool. Optical flow is NOT
handled here — use ``tools/flow_extraction.py`` (TVL1/Farneback on host
CPU) which writes the matching ``flow_x_/flow_y_`` files.

Usage:
    python tools/data/build_rawframes.py data/ucf101/videos \
        data/ucf101/rawframes --level 2 --ext avi --new-short 256
"""

import argparse
import glob
import os
import os.path as osp
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))


def parse_args():
    parser = argparse.ArgumentParser(description='Extract RGB rawframes')
    parser.add_argument('src_dir', help='video source directory')
    parser.add_argument('out_dir', help='rawframes output directory')
    parser.add_argument('--level', type=int, default=2, choices=[1, 2])
    parser.add_argument('--ext', default='mp4',
                        help='video file extension (mp4/avi/webm/...)')
    parser.add_argument('--num-worker', type=int, default=8)
    parser.add_argument('--new-width', type=int, default=0)
    parser.add_argument('--new-height', type=int, default=0)
    parser.add_argument('--new-short', type=int, default=0,
                        help='resize so the short side is N (0 = keep)')
    parser.add_argument('--filename-tmpl', default='img_{:05d}.jpg')
    parser.add_argument('--start-index', type=int, default=1,
                        help='index of the first frame file')
    parser.add_argument('--resume', action='store_true',
                        help='skip videos whose output dir is non-empty')
    return parser.parse_args()


def _out_size(h, w, new_w, new_h, new_short):
    if new_short > 0:
        if h <= w:
            return new_short, max(1, int(round(w * new_short / h)))
        return max(1, int(round(h * new_short / w))), new_short
    if new_w > 0 and new_h > 0:
        return new_h, new_w
    return h, w


def _decode_all(path, new_w, new_h, new_short):
    """All frames of one video as uint8 RGB (native FFmpeg, cv2 fallback)."""
    from vfs_tpu.datasets.native_loader import (decode_video_indices,
                                                probe_video)
    probed = probe_video(path)
    if probed is not None:
        nf, h, w, _ = probed
        if nf > 0:
            oh, ow = _out_size(h, w, new_w, new_h, new_short)
            frames = decode_video_indices(path, np.arange(nf), (oh, ow))
            if frames is not None:
                return frames
    import cv2
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        h, w = frame.shape[:2]
        oh, ow = _out_size(h, w, new_w, new_h, new_short)
        if (oh, ow) != (h, w):
            frame = cv2.resize(frame, (ow, oh),
                               interpolation=cv2.INTER_LINEAR)
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames) if frames else None


def extract_one(task):
    (full_path, rel_path, args_d) = task
    out_dir = osp.join(args_d['out_dir'],
                       osp.splitext(rel_path)[0])
    os.makedirs(out_dir, exist_ok=True)
    if args_d['resume'] and os.listdir(out_dir):
        return rel_path, -1
    frames = _decode_all(full_path, args_d['new_width'],
                         args_d['new_height'], args_d['new_short'])
    if frames is None:
        return rel_path, 0
    import cv2
    for i, frame in enumerate(frames):
        name = args_d['filename_tmpl'].format(i + args_d['start_index'])
        cv2.imwrite(osp.join(out_dir, name),
                    cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    return rel_path, len(frames)


def main():
    args = parse_args()
    pattern = osp.join(args.src_dir, *(['*'] * (args.level - 1)),
                       f'*.{args.ext}')
    videos = sorted(glob.glob(pattern))
    print(f'{len(videos)} videos under {args.src_dir}')
    os.makedirs(args.out_dir, exist_ok=True)
    args_d = dict(out_dir=args.out_dir, new_width=args.new_width,
                  new_height=args.new_height, new_short=args.new_short,
                  filename_tmpl=args.filename_tmpl,
                  start_index=args.start_index, resume=args.resume)
    tasks = [(v, osp.relpath(v, args.src_dir), args_d) for v in videos]
    failed = 0
    with Pool(args.num_worker) as pool:
        for i, (rel, n) in enumerate(pool.imap_unordered(extract_one, tasks)):
            if n == 0:
                failed += 1
                print(f'FAILED {rel}')
            elif (i + 1) % 100 == 0:
                print(f'[{i + 1}/{len(videos)}] {rel}: {n} frames')
    print(f'done; {failed} failures')
    if failed:
        sys.exit(1)


if __name__ == '__main__':
    main()
