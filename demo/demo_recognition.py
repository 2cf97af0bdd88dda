#!/usr/bin/env python
"""Action-recognition demo (reference demo/demo.py:1-124, SURVEY §3.4):
run a recognizer over one video and print the top-5 classes; optionally
render the top label onto an output mp4.

Usage:
    python demo/demo_recognition.py CONFIG CHECKPOINT VIDEO LABEL_FILE \
        [--use-frames] [--out-filename out.mp4] [--fps 30]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args():
    parser = argparse.ArgumentParser(description='recognition demo')
    parser.add_argument('config', help='test config file path')
    parser.add_argument('checkpoint', help='orbax checkpoint dir '
                        '(or "random" for random weights)')
    parser.add_argument('video', help='video file or rawframes directory')
    parser.add_argument('label', help='label file, one class name per line')
    parser.add_argument('--use-frames', action='store_true',
                        help='treat VIDEO as a rawframes directory')
    parser.add_argument('--out-filename', default=None,
                        help='render the top label onto an output mp4')
    parser.add_argument('--fps', type=int, default=30)
    parser.add_argument('--font-scale', type=float, default=0.7)
    return parser.parse_args()


def main():
    args = parse_args()
    from vfs_tpu.apis.inference import init_recognizer, inference_recognizer

    ckpt = None if args.checkpoint == 'random' else args.checkpoint
    model_tuple = init_recognizer(args.config, ckpt,
                                  use_frames=args.use_frames)
    results = inference_recognizer(model_tuple, args.video, args.label,
                                   use_frames=args.use_frames)
    print('The top-5 labels with corresponding scores are:')
    for label, score in results:
        print(f'{label}: {float(score):.4f}')

    if args.out_filename:
        import cv2
        cap = cv2.VideoCapture(args.video)
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(args.out_filename,
                                 cv2.VideoWriter_fourcc(*'mp4v'),
                                 args.fps, (w, h))
        top_label = str(results[0][0])
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            cv2.putText(frame, top_label, (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, args.font_scale,
                        (255, 255, 255), 2, cv2.LINE_AA)
            writer.write(frame)
        cap.release()
        writer.release()
        print(f'wrote {args.out_filename}')


if __name__ == '__main__':
    main()
