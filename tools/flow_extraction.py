#!/usr/bin/env python
"""Dense optical flow extraction (reference: tools/flow_extraction.py —
extracts x/y flow frame JPEGs for flow-modality training).

Uses OpenCV TV-L1 when available (contrib), Farneback otherwise.

Usage:
    python tools/flow_extraction.py VIDEO_OR_DIR --out-dir flows \
        [--bound 20] [--method tvl1|farneback]
"""

import argparse
import glob
import os
import os.path as osp
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def flow_to_img(raw_flow, bound):
    import numpy as np
    flow = np.clip(raw_flow, -bound, bound)
    flow = (flow + bound) * (255.0 / (2 * bound))
    return flow.round().astype('uint8')


def extract_flow(video_path, out_dir, bound, method):
    import cv2
    import numpy as np
    cap = cv2.VideoCapture(video_path)
    assert cap.isOpened(), f'cannot open {video_path}'
    if method == 'tvl1' and hasattr(cv2, 'optflow'):
        calc = cv2.optflow.DualTVL1OpticalFlow_create()
        flow_fn = calc.calc
    else:
        def flow_fn(prev, cur, _):
            return cv2.calcOpticalFlowFarneback(
                prev, cur, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    os.makedirs(out_dir, exist_ok=True)
    prev_gray = None
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if prev_gray is not None:
            flow = flow_fn(prev_gray, gray, None)
            cv2.imwrite(osp.join(out_dir, f'x_{idx:05d}.jpg'),
                        flow_to_img(flow[..., 0], bound))
            cv2.imwrite(osp.join(out_dir, f'y_{idx:05d}.jpg'),
                        flow_to_img(flow[..., 1], bound))
            idx += 1
        prev_gray = gray
    cap.release()
    return idx


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('input', help='video file or directory of videos')
    parser.add_argument('--out-dir', default='flows')
    parser.add_argument('--bound', type=float, default=20)
    parser.add_argument('--method', choices=['tvl1', 'farneback'],
                        default='tvl1')
    args = parser.parse_args()
    if osp.isdir(args.input):
        videos = sorted(glob.glob(osp.join(args.input, '*.mp4')) +
                        glob.glob(osp.join(args.input, '*.avi')))
    else:
        videos = [args.input]
    for video in videos:
        name = osp.splitext(osp.basename(video))[0]
        n = extract_flow(video, osp.join(args.out_dir, name), args.bound,
                         args.method)
        print(f'{name}: {n} flow frames')


if __name__ == '__main__':
    main()
