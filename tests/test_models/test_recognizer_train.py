"""Recognition training end-to-end: train_model drives a Recognizer2D
(labels + dropout rng through the jitted step) from a config-built
RawframeDataset — the reference's recognition workflow
(mmaction/apis/train.py) that the SimSiam-only step used to reject."""

import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from vfs_tpu.models import build_model
from vfs_tpu.utils import Config


def make_rawframes(root, num_videos=8, num_frames=6):
    import cv2
    lines = []
    rng = np.random.RandomState(0)
    for v in range(num_videos):
        d = osp.join(root, f'vid{v}')
        os.makedirs(d)
        label = v % 2
        for i in range(1, num_frames + 1):
            # label-dependent mean color so the loss can actually drop
            img = rng.randint(0, 40, (32, 32, 3), np.uint8) + \
                (180 * label)
            cv2.imwrite(osp.join(d, f'img_{i:05d}.jpg'), img)
        lines.append(f'vid{v} {num_frames} {label}\n')
    ann = osp.join(osp.dirname(root), 'list.txt')
    open(ann, 'w').writelines(lines)
    return ann


def test_train_recognizer2d_end_to_end(tmp_path):
    from vfs_tpu.apis.train import train_model
    from vfs_tpu.datasets import build_dataset

    ann = make_rawframes(str(tmp_path / 'frames'))
    pipeline = [
        dict(type='SampleFrames', clip_len=1, frame_interval=0, num_clips=2,
             out_of_bound_opt='loop'),
        dict(type='RawFrameDecode'),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NCHW'),
        dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    ]
    cfg = Config.fromdict(dict(
        work_dir=str(tmp_path / 'work'), seed=0, auto_resume=False,
        model=dict(type='Recognizer2D',
                   backbone=dict(type='ResNet', depth=18),
                   cls_head=dict(type='TSNHead', num_classes=2,
                                 in_channels=512, dropout_ratio=0.4)),
        data=dict(videos_per_gpu=4, workers_per_gpu=1),
        optimizer=dict(type='SGD', lr=0.05, momentum=0.9),
        optimizer_config=dict(grad_clip=None),
        lr_config=dict(policy='CosineAnnealing', min_lr=0, by_epoch=False),
        total_epochs=4, checkpoint_config=dict(interval=10),
        log_config=dict(interval=1),
    ))
    dataset = build_dataset(dict(type='RawframeDataset', ann_file=ann,
                                 data_prefix=str(tmp_path / 'frames'),
                                 pipeline=pipeline))
    model = build_model(cfg.model, test_cfg=dict(average_clips=None))
    train_model(model, dataset, cfg)

    records = [json.loads(ln)
               for ln in open(tmp_path / 'work' / 'train_log.jsonl')]
    losses = [r['loss_cls'] for r in records if 'loss_cls' in r]
    assert len(losses) >= 4
    assert all(np.isfinite(losses))
    # separable-by-color task: the tail must improve on the head
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
