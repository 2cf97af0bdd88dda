#!/usr/bin/env python
"""Video correspondence demo: propagate a first-frame mask through a video
and render a colored overlay mp4.

The reference ships only the inherited action-recognition demo
(reference demo/demo.py) while its demo_out.mp4 asset implies a
mask-propagation demo (SURVEY §3.4); this provides it natively.

Usage:
    python demo/demo.py CONFIG CHECKPOINT VIDEO MASK_PNG OUT_MP4 \
        [--alpha 0.5] [--options k=v ...]

MASK_PNG is a palette PNG (DAVIS-style int labels) for the first frame.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args():
    parser = argparse.ArgumentParser(description='mask propagation demo')
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('video')
    parser.add_argument('mask')
    parser.add_argument('out')
    parser.add_argument('--alpha', type=float, default=0.5)
    parser.add_argument('--height', type=int, default=480,
                        help='short-side resize before propagation')
    parser.add_argument('--options', nargs='+', default=None)
    return parser.parse_args()


def main():
    args = parse_args()
    import cv2
    import numpy as np
    from PIL import Image

    from vfs_tpu.datasets.davis_dataset import PALETTE
    from vfs_tpu.datasets.pipelines.augmentations import _rescale_size
    from vfs_tpu.models import build_model
    from vfs_tpu.utils import Config, parse_options

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_dict(parse_options(args.options))

    # decode video (host cv2 + FFmpeg)
    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), f'cannot open {args.video}'
    fps = cap.get(cv2.CAP_PROP_FPS) or 24
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    assert frames, 'empty video'
    oh, ow = frames[0].shape[:2]
    new_w, new_h = _rescale_size((ow, oh), (np.inf, args.height))
    frames_rs = [cv2.resize(f, (new_w, new_h)) for f in frames]

    mask = np.asarray(Image.open(args.mask))
    if mask.ndim == 3:
        mask = mask[..., 0]
    if mask.shape != (new_h, new_w):
        mask = np.asarray(Image.fromarray(mask).resize((new_w, new_h),
                                                       Image.NEAREST))

    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    imgs = np.stack(frames_rs).astype(np.uint8)
    meta = [dict(original_shape=(new_h, new_w),
                 img_norm_cfg=dict(mean=mean, std=std))]

    model_cfg = dict(type='VanillaTracker', backbone=dict(cfg.model.backbone))
    model_cfg['backbone']['pretrained'] = args.checkpoint
    model = build_model(model_cfg, test_cfg=cfg.test_cfg)
    model.init_weights()
    preds = model.forward_test(imgs, mask.astype(np.uint8), meta)[0]

    palette = np.asarray(PALETTE, np.uint8)
    writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                             (new_w, new_h))
    for frame, pred in zip(frames_rs, preds):
        color = palette[np.clip(pred, 0, len(palette) - 1)]
        overlay = frame.copy()
        fg = pred > 0
        overlay[fg] = (args.alpha * color[fg] +
                       (1 - args.alpha) * frame[fg]).astype(np.uint8)
        writer.write(cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
    writer.release()
    print(f'wrote {args.out} ({len(frames)} frames @ {fps:.1f} fps)')


if __name__ == '__main__':
    main()
