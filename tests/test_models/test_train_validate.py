"""train_model(validate=True): EvalHook runs the propagation eval per
epoch with the live training weights and tracks best.json (reference
wiring: apis/train.py:99-113 + eval_hooks)."""

import json
import os.path as osp
import sys

import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from test_data.test_davis_e2e import VAL_PIPELINE, make_mini_davis  # noqa
from test_models.test_simsiam_train import (MODEL_CFG,  # noqa
                                            make_video_dataset)

from vfs_tpu.models import build_model
from vfs_tpu.utils import Config


def test_train_with_validation(tmp_path):
    ann = make_video_dataset(str(tmp_path / 'videos'), num_videos=2,
                             num_frames=8, hw=(64, 96))
    davis_ann, img_root, ann_root = make_mini_davis(
        str(tmp_path / 'davis'), num_videos=1, num_frames=6)
    cfg = Config.fromdict(dict(
        work_dir=str(tmp_path / 'work'),
        seed=0,
        auto_resume=False,
        model=MODEL_CFG,
        test_cfg=dict(precede_frames=3, topk=5, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=12, batch_step=3),
        data=dict(
            videos_per_gpu=2, workers_per_gpu=1,
            val=dict(type='DavisDataset', ann_file=davis_ann,
                     data_prefix=img_root, anno_prefix=ann_root,
                     data_root=str(tmp_path / 'davis'),
                     pipeline=VAL_PIPELINE, test_mode=True)),
        optimizer=dict(type='SGD', lr=0.01, momentum=0.9),
        optimizer_config=dict(grad_clip=None),
        lr_config=dict(policy='CosineAnnealing', min_lr=0, by_epoch=False),
        total_epochs=1,
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=1),
        evaluation=dict(interval=1, metrics='davis',
                        key_indicator='J&F-Mean', rule='greater'),
    ))
    train_pipeline = [
        dict(type='OpenCVInit'),
        dict(type='SampleFrames', clip_len=1, frame_interval=0, num_clips=4,
             out_of_bound_opt='loop'),
        dict(type='Clip2Frame', clip_len=2),
        dict(type='OpenCVDecode'),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NCTHW'),
        dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    ]
    from vfs_tpu.apis.train import train_model
    from vfs_tpu.datasets import build_dataset
    dataset = build_dataset(dict(type='VideoDataset', ann_file=ann,
                                 data_prefix=str(tmp_path / 'videos'),
                                 pipeline=train_pipeline))
    model = build_model(MODEL_CFG, train_cfg=dict(intra_video=True))
    train_model(model, dataset, cfg, validate=True)
    best = json.load(open(tmp_path / 'work' / 'best.json'))
    assert best['key_indicator'] == 'J&F-Mean'
    assert 0.0 <= best['best_score'] <= 1.0
    # val record in the jsonl log
    lines = [json.loads(ln) for ln in
             open(tmp_path / 'work' / 'train_log.jsonl')]
    assert any(r.get('mode') == 'val' for r in lines)
