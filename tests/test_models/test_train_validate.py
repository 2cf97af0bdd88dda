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


def _make_cfg(tmp_path, davis_ann, img_root, ann_root):
    return Config.fromdict(dict(
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


def test_val_eval_fn_sharded_and_handoff_assert(tmp_path):
    """DistEvalHook parity: the validation eval runs sharded over local
    devices (reference eval_hooks.py:135) and the weight hand-off refuses
    to silently evaluate init weights when '_backbone' is missing."""
    import jax

    from vfs_tpu.apis.train import build_val_eval_fn

    davis_ann, img_root, ann_root = make_mini_davis(
        str(tmp_path / 'davis'), num_videos=2, num_frames=4)
    cfg = _make_cfg(tmp_path, davis_ann, img_root, ann_root)

    model = build_model(MODEL_CFG, train_cfg=dict(intra_video=True))
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, 2, 32, 32, 3)), train=True)

    class FakeState:
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})

    devs = jax.local_devices()[:2]
    assert len(devs) == 2, 'conftest should provide an 8-device CPU mesh'
    eval_fn = build_val_eval_fn(cfg, lambda: FakeState, local_devices=devs)
    results = eval_fn()
    assert 'J&F-Mean' in results

    # same weights through the serial path must agree exactly
    eval_fn_serial = build_val_eval_fn(cfg, lambda: FakeState)
    results_serial = eval_fn_serial()
    assert results['J&F-Mean'] == pytest.approx(
        results_serial['J&F-Mean'], abs=1e-6)

    class RenamedState:
        params = {'backbone_net': dict(variables['params'])['_backbone']}
        batch_stats = {}

    eval_fn_bad = build_val_eval_fn(cfg, lambda: RenamedState)
    with pytest.raises(KeyError, match='_backbone'):
        eval_fn_bad()


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
