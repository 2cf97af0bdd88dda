#!/usr/bin/env python
"""Extract per-snippet TSN features/scores from untrimmed rawframe videos
(reference: tools/data/activitynet/tsn_feature_extraction.py:1-140 — the
BSN/BMN feature-preparation step).

TPU-first shape handling: snippets are padded to a fixed batch bucket so
one jitted forward serves every video (XLA static shapes), and snippets
stream through in chunks of --batch-size.

Usage:
    python tools/data/activitynet/tsn_feature_extraction.py \
        --data-prefix data/ActivityNet/rawframes \
        --output-prefix data/ActivityNet/rgb_feat \
        --data-list data/ActivityNet/anet_train_video.txt \
        --ckpt tsn_r50.pth
"""

import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__))))))


def parse_args():
    parser = argparse.ArgumentParser(description='Extract TSN features')
    parser.add_argument('--data-prefix', default='')
    parser.add_argument('--output-prefix', default='')
    parser.add_argument('--data-list', required=True,
                        help='lines of `frame_dir num_frames output_file`')
    parser.add_argument('--frame-interval', type=int, default=16)
    parser.add_argument('--clip-len', type=int, default=1)
    parser.add_argument('--ckpt', default=None,
                        help='torchvision-layout backbone checkpoint '
                             '(.pth) for the R50 feature extractor')
    parser.add_argument('--num-classes', type=int, default=200)
    parser.add_argument('--batch-size', type=int, default=64,
                        help='snippets per jitted forward (static bucket)')
    parser.add_argument('--part', type=int, default=0)
    parser.add_argument('--total', type=int, default=1)
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from vfs_tpu.datasets.pipelines import Compose
    from vfs_tpu.models import build_model

    pipeline = Compose([
        dict(type='UntrimmedSampleFrames', clip_len=args.clip_len,
             frame_interval=args.frame_interval),
        dict(type='RawFrameDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=256),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NCHW'),
        dict(type='Collect', keys=['imgs'], meta_keys=[]),
    ])

    model = build_model(
        dict(type='Recognizer2D',
             backbone=dict(type='ResNet', depth=50, norm_eval=False,
                           pretrained=args.ckpt),
             cls_head=dict(type='TSNHead', num_classes=args.num_classes,
                           in_channels=2048, spatial_type='avg',
                           consensus=dict(type='AvgConsensus', dim=1))),
        test_cfg=dict(average_clips=None))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 1, 256, 256, 3)), train=False,
                           return_loss=False)

    @jax.jit
    def forward(variables, imgs):
        # imgs (B, H, W, C): each snippet is its own "video" of one segment
        return model.apply(variables, imgs[:, None], train=False,
                           return_loss=False)

    items = [ln.strip() for ln in open(args.data_list) if ln.strip()]
    items = items[args.part::args.total]
    for n, item in enumerate(items):
        frame_dir, length, output_file = item.split()
        sample = pipeline(dict(
            frame_dir=osp.join(args.data_prefix, frame_dir),
            total_frames=int(length), filename_tmpl='img_{:05d}.jpg',
            start_index=1, modality='RGB'))
        imgs = np.asarray(sample['imgs'])  # (num_snippets, H, W, C)
        # NCHW formatting gives channel-first; backbone wants NHWC
        if imgs.shape[1] == 3:
            imgs = imgs.transpose(0, 2, 3, 1)
        feats = []
        for start in range(0, len(imgs), args.batch_size):
            part = imgs[start:start + args.batch_size]
            pad = args.batch_size - len(part)
            if pad:  # static bucket: one compile for every video
                part = np.concatenate(
                    [part, np.zeros((pad,) + part.shape[1:], part.dtype)])
            out = np.asarray(forward(variables, jnp.asarray(part)))
            feats.append(out[:len(out) - pad if pad else len(out)])
        feat = np.concatenate(feats)
        out_path = osp.join(args.output_prefix, output_file)
        os.makedirs(osp.dirname(out_path) or '.', exist_ok=True)
        with open(out_path, 'wb') as f:
            pickle.dump(feat, f)
        print(f'[{n + 1}/{len(items)}] {frame_dir}: {feat.shape} '
              f'-> {out_path}')


if __name__ == '__main__':
    main()
