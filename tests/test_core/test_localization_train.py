"""End-to-end training of the localization stack from synthetic
ActivityNet-format fixtures (VERDICT.md missing#1/#2): the pipeline
transforms LoadLocalizationFeature / GenerateLocalizationLabels /
LoadProposals / SampleProposalFrames feed BMN, TEM, PEM, and SSN through
build_dataset -> build_dataloader -> the localizer train loop, and losses
decrease.

Reference semantics: loading.py:455-695 (SampleProposalFrames),
loading.py:1174-1313 (feature/label/proposal loaders).
"""

import json
import os
import os.path as osp

import jax
import numpy as np
import pytest

from vfs_tpu.apis.train_localizer import (_KINDS, _create_state_from_sample,
                                          make_localizer_train_step,
                                          train_localizer_model)
from vfs_tpu.core.optimizer.builder import build_optimizer
from vfs_tpu.datasets import build_dataloader, build_dataset
from vfs_tpu.models import build_model
from vfs_tpu.utils import Config

T_SCALE = 20
FEAT_DIM = 8


def make_activitynet(root, num_videos=4, tscale=T_SCALE, feat_dim=FEAT_DIM,
                     seed=0):
    """ActivityNet-format fixture: JSON database + per-video feature CSVs
    whose features correlate with the annotated segment so the losses have
    signal to fit."""
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    database = {}
    for i in range(num_videos):
        name = f'v_test{i:02d}'
        dur = 100.0
        start = float(rng.uniform(0.1, 0.5)) * dur
        end = start + float(rng.uniform(0.2, 0.4)) * dur
        feats = rng.randn(tscale, feat_dim).astype(np.float32) * 0.1
        lo = int(start / dur * tscale)
        hi = max(lo + 1, int(end / dur * tscale))
        feats[lo:hi, :] += 1.0  # in-segment bump
        header = ','.join(f'f{j}' for j in range(feat_dim))
        rows = '\n'.join(','.join(f'{x:.4f}' for x in row) for row in feats)
        with open(osp.join(root, name + '.csv'), 'w') as f:
            f.write(header + '\n' + rows + '\n')
        database[name] = dict(
            duration_second=dur, duration_frame=3000, feature_frame=2996,
            annotations=[dict(segment=[start, end], label='Test')],
            fps=30.0, rfps=29.97)
    ann = osp.join(root, 'anno.json')
    with open(ann, 'w') as f:
        json.dump(database, f)
    return ann


def make_pgm_fixture(root, num_videos=4, top_k=16, feat_dim=32, seed=1):
    """PGM proposal CSVs + BSP feature .npy files for PEM, with features
    predictive of the match IoU."""
    rng = np.random.RandomState(seed)
    pdir = osp.join(root, 'pgm_proposals')
    fdir = osp.join(root, 'pgm_features')
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(fdir, exist_ok=True)
    for i in range(num_videos):
        name = f'v_test{i:02d}'
        iou = rng.rand(top_k).astype(np.float32)
        rows = np.stack([
            rng.rand(top_k), rng.rand(top_k), rng.rand(top_k),
            rng.rand(top_k), rng.rand(top_k), iou], axis=1)
        header = 'tmin,tmax,tmin_score,tmax_score,score,match_ious'
        with open(osp.join(pdir, name + '.csv'), 'w') as f:
            f.write(header + '\n')
            f.write('\n'.join(','.join(f'{x:.4f}' for x in r)
                              for r in rows))
        feats = rng.randn(top_k, feat_dim).astype(np.float32) * 0.1
        feats[:, 0] = iou  # learnable signal
        np.save(osp.join(fdir, name + '.npy'), feats)
    return pdir, fdir


def _run_steps(model, dataset, kind, batch_size=2, steps=8, lr=0.01):
    loader = build_dataloader(dataset, videos_per_gpu=batch_size,
                              workers_per_gpu=0, shuffle=True,
                              drop_last=True, seed=0)
    tx, _ = build_optimizer(dict(type='Adam', lr=lr), None, steps)
    prepare, _ = _KINDS[kind]
    rng = jax.random.PRNGKey(0)
    sample = next(iter(loader))
    state = _create_state_from_sample(model, rng, sample, tx, kind)
    step_fn = jax.jit(make_localizer_train_step(model, tx, kind))
    losses = []
    done = 0
    for epoch in range(100):
        loader.set_epoch(epoch)
        for batch in loader:
            tensors = {k: np.asarray(v) for k, v in
                       prepare(model, batch).items()}
            rng, step_rng = jax.random.split(rng)
            state, log_vars = step_fn(state, tensors, step_rng)
            losses.append(float(log_vars['loss']))
            done += 1
            if done >= steps:
                return losses
    return losses


def test_bmn_trains_end_to_end(tmp_path):
    ann = make_activitynet(str(tmp_path))
    dataset = build_dataset(dict(
        type='ActivityNetDataset', ann_file=ann,
        data_prefix=str(tmp_path),
        pipeline=[
            dict(type='LoadLocalizationFeature'),
            dict(type='GenerateLocalizationLabels'),
            dict(type='Collect', keys=['raw_feature', 'gt_bbox'],
                 meta_keys=('video_name',)),
        ]))
    model = build_model(dict(
        type='BMN', temporal_dim=T_SCALE, boundary_ratio=0.5,
        num_samples=8, num_samples_per_bin=3, feat_dim=FEAT_DIM,
        soft_nms_alpha=0.4, soft_nms_low_threshold=0.5,
        soft_nms_high_threshold=0.9, post_process_top_k=100))
    losses = _run_steps(model, dataset, 'BMN', steps=16, lr=0.02)
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_tem_trains_end_to_end(tmp_path):
    ann = make_activitynet(str(tmp_path))
    dataset = build_dataset(dict(
        type='ActivityNetDataset', ann_file=ann,
        data_prefix=str(tmp_path),
        pipeline=[
            dict(type='LoadLocalizationFeature'),
            dict(type='GenerateLocalizationLabels'),
        ]))
    model = build_model(dict(
        type='TEM', temporal_dim=T_SCALE, boundary_ratio=0.1,
        tem_feat_dim=FEAT_DIM, tem_hidden_dim=32, tem_match_threshold=0.5))
    losses = _run_steps(model, dataset, 'TEM', steps=8)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_pem_trains_end_to_end(tmp_path):
    ann = make_activitynet(str(tmp_path))
    pdir, fdir = make_pgm_fixture(str(tmp_path))
    dataset = build_dataset(dict(
        type='ActivityNetDataset', ann_file=ann,
        data_prefix=str(tmp_path),
        pipeline=[
            dict(type='LoadProposals', top_k=16,
                 pgm_proposals_dir=pdir, pgm_features_dir=fdir),
            dict(type='Collect',
                 keys=['bsp_feature', 'reference_temporal_iou'],
                 meta_keys=('video_name',)),
        ]))
    model = build_model(dict(
        type='PEM', pem_feat_dim=32, pem_hidden_dim=64, pem_u_ratio_m=1.0,
        pem_u_ratio_l=2.0, pem_high_temporal_iou_threshold=0.6,
        pem_low_temporal_iou_threshold=0.2, soft_nms_alpha=0.75,
        soft_nms_low_threshold=0.65, soft_nms_high_threshold=0.9,
        post_process_top_k=100))
    losses = _run_steps(model, dataset, 'PEM', steps=10)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


# --------------------------------------------------------------- SSN ------
def make_ssn_rawframes(root, names=('video_a', 'video_b'),
                       total=(300, 200), hw=(32, 40), seed=2):
    rng = np.random.RandomState(seed)
    import cv2
    for name, n in zip(names, total):
        d = osp.join(root, name)
        os.makedirs(d, exist_ok=True)
        for i in range(1, n + 1):
            img = rng.randint(0, 255, hw + (3,), np.uint8)
            cv2.imwrite(osp.join(d, f'img_{i:05d}.jpg'), img)


def test_ssn_trains_end_to_end(tmp_path):
    from test_data.test_ssn import TEST_CFG, TRAIN_CFG, make_proposal_file
    ann = str(tmp_path / 'proposals.txt')
    make_proposal_file(ann)
    make_ssn_rawframes(str(tmp_path))
    pipeline = [
        dict(type='SampleProposalFrames', clip_len=1, body_segments=5,
             aug_segments=(2, 2), aug_ratio=0.5),
        dict(type='RawFrameDecode'),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Normalize', mean=[128.0] * 3, std=[64.0] * 3),
        dict(type='FormatShape', input_format='NHWC'),
        dict(type='Collect',
             keys=['imgs', 'proposal_scale_factor', 'proposal_type',
                   'proposal_labels', 'reg_targets'],
             meta_keys=()),
    ]
    dataset = build_dataset(dict(
        type='SSNDataset', ann_file=ann, pipeline=pipeline,
        train_cfg=TRAIN_CFG, test_cfg=TEST_CFG, data_prefix=str(tmp_path),
        body_segments=5, aug_segments=(2, 2), aug_ratio=0.5,
        filename_tmpl='img_{:05d}.jpg'))
    model = build_model(dict(
        type='SSN',
        backbone=dict(type='ResNet', depth=18, out_indices=(3,)),
        cls_head=dict(type='SSNHead', dropout_ratio=0.5, in_channels=512,
                      num_classes=3,
                      consensus=dict(type='STPPTrain', stpp_cfg=(1, 1, 1),
                                     num_seg=(2, 5, 2)))),
        train_cfg=TRAIN_CFG, test_cfg=TEST_CFG)
    # SSNDataset's proposal sampling draws from the GLOBAL numpy rng, so
    # pin it — otherwise the loss trajectory depends on which tests ran
    # before this one (batch 1 + dropout 0.5 is noisy).
    np.random.seed(0)
    losses = _run_steps(model, dataset, 'SSN', batch_size=1, steps=6,
                        lr=0.003)
    assert all(np.isfinite(losses)), losses
    assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses


def test_train_localizer_model_wiring(tmp_path):
    """The config->loop path (as tools/train.py dispatches it) runs an
    epoch and writes a checkpoint."""
    ann = make_activitynet(str(tmp_path))
    dataset = build_dataset(dict(
        type='ActivityNetDataset', ann_file=ann, data_prefix=str(tmp_path),
        pipeline=[
            dict(type='LoadLocalizationFeature'),
            dict(type='GenerateLocalizationLabels'),
        ]))
    cfg = Config(dict(
        model=dict(type='TEM', temporal_dim=T_SCALE, boundary_ratio=0.1,
                   tem_feat_dim=FEAT_DIM, tem_hidden_dim=32,
                   tem_match_threshold=0.5),
        data=dict(videos_per_gpu=2, workers_per_gpu=0),
        optimizer=dict(type='Adam', lr=0.001),
        total_epochs=1,
        work_dir=str(tmp_path / 'work')))
    model = build_model(cfg.model)
    state = train_localizer_model(model, dataset, cfg)
    assert int(state.step) == 2  # 4 videos / batch 2
    ckpts = os.listdir(str(tmp_path / 'work' / 'checkpoints'))
    assert ckpts, 'no checkpoint written'


def test_train_localizer_validate(tmp_path):
    """--validate on a localizer config runs a per-epoch val loss over
    cfg.data.val and logs it under mode='val' (the flag used to be
    silently discarded)."""
    ann = make_activitynet(str(tmp_path))
    pipeline = [
        dict(type='LoadLocalizationFeature'),
        dict(type='GenerateLocalizationLabels'),
    ]
    data_cfg = dict(type='ActivityNetDataset', ann_file=ann,
                    data_prefix=str(tmp_path), pipeline=pipeline)
    dataset = build_dataset(data_cfg)
    cfg = Config(dict(
        model=dict(type='TEM', temporal_dim=T_SCALE, boundary_ratio=0.1,
                   tem_feat_dim=FEAT_DIM, tem_hidden_dim=32,
                   tem_match_threshold=0.5),
        data=dict(videos_per_gpu=2, workers_per_gpu=0, val=data_cfg),
        optimizer=dict(type='Adam', lr=0.001),
        total_epochs=1,
        work_dir=str(tmp_path / 'work')))
    model = build_model(cfg.model)
    train_localizer_model(model, dataset, cfg, validate=True)
    log = (tmp_path / 'work' / 'train_log.jsonl').read_text()
    val_entries = [json.loads(ln) for ln in log.splitlines()
                   if '"val"' in ln]
    assert val_entries, 'no val entries logged'
    assert np.isfinite(val_entries[-1]['loss'])
