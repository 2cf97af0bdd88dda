#!/usr/bin/env python
"""Inference FPS benchmark over a test dataset (reference:
tools/analysis/benchmark.py:29-91 — warmup then per-iteration timing; the
reference cuda-synchronizes, here completion is forced by fetching
predictions to host).

Usage:
    python tools/analysis/benchmark.py CONFIG CHECKPOINT [--num-videos N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('--num-videos', type=int, default=10)
    parser.add_argument('--num-warmup', type=int, default=1)
    parser.add_argument('--options', nargs='+', default=None)
    args = parser.parse_args()

    import numpy as np

    from vfs_tpu.datasets import build_dataset
    from vfs_tpu.models import build_model
    from vfs_tpu.utils import Config, parse_options

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_dict(parse_options(args.options))
    dataset = build_dataset(cfg.data.test, dict(test_mode=True))
    model_cfg = dict(type='VanillaTracker',
                     backbone=dict(cfg.model.backbone))
    model_cfg['backbone']['pretrained'] = args.checkpoint
    model = build_model(model_cfg, test_cfg=cfg.test_cfg)
    model.init_weights()

    total_frames = 0
    total_time = 0.0
    n = min(args.num_videos + args.num_warmup, len(dataset))
    for i in range(n):
        sample = dataset[i]
        imgs = sample['imgs']
        if imgs.ndim == 5:
            imgs = imgs[0]
        t0 = time.time()
        preds = model.forward_test(imgs, sample['ref_seg_map'],
                                   [sample['img_meta']])
        np.asarray(preds[0]).sum()
        dt = time.time() - t0
        if i >= args.num_warmup:
            total_frames += imgs.shape[0]
            total_time += dt
        print(f'video {i}: {imgs.shape[0]} frames in {dt:.2f}s '
              f'({imgs.shape[0] / dt:.2f} fps)')
    if total_time > 0:
        print(f'Overall: {total_frames / total_time:.2f} frames/sec')


if __name__ == '__main__':
    main()
