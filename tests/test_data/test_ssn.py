"""SSN dataset + model: proposal parsing, pool construction, train
sampling, test tick computation, detection evaluation."""

import os.path as osp

import numpy as np
import pytest

from vfs_tpu.datasets import build_dataset

TRAIN_CFG = dict(ssn=dict(
    assigner=dict(positive_iou_threshold=0.7,
                  incomplete_iou_threshold=0.3,
                  background_iou_threshold=0.01,
                  background_coverage_threshold=0.02,
                  incomplete_overlap_threshold=0.01),
    sampler=dict(num_per_video=8, positive_ratio=1, background_ratio=1,
                 incomplete_ratio=6, add_gt_as_proposals=True),
    loss_weight=dict(comp_loss_weight=0.1, reg_loss_weight=0.1)))
TEST_CFG = dict(ssn=dict(sampler=dict(test_interval=6, batch_size=16),
                         evaluater=dict(top_k=200, nms=0.2,
                                        softmax_before_filter=True,
                                        cls_top_k=2)))


def make_proposal_file(path):
    text = """# 0
video_a
1
300
2
1 30 90
2 150 240
4
1 0.85 0.9 35 95
1 0.2 0.8 10 40
2 0.9 0.95 145 235
0 0.0 0.0 250 290
# 1
video_b
1
200
1
3 50 120
3
3 0.75 0.8 55 130
3 0.1 0.9 60 80
0 0.0 0.0 150 190
"""
    with open(path, 'w') as f:
        f.write(text)


@pytest.fixture()
def ssn_dataset(tmp_path):
    ann = str(tmp_path / 'proposals.txt')
    make_proposal_file(ann)
    pipeline = []  # identity: inspect the prepared dict directly
    return build_dataset(dict(
        type='SSNDataset', ann_file=ann, pipeline=pipeline,
        train_cfg=TRAIN_CFG, test_cfg=TEST_CFG,
        data_prefix=str(tmp_path), body_segments=5, aug_segments=(2, 2),
        aug_ratio=0.5))


def test_ssn_pools_and_sampling(ssn_dataset):
    ds = ssn_dataset
    assert len(ds) == 2
    assert len(ds.positive_pool) >= 3  # gt-as-proposal included
    assert len(ds.background_pool) == 2
    res = ds.prepare_train_frames(0)
    assert res['proposal_type'].shape == (8,)
    assert (res['proposal_type'] == 0).sum() == ds.positive_per_video
    assert res['reg_targets'].shape == (8, 2)
    assert res['proposal_scale_factor'].shape == (8, 2)
    # background proposals get label 0
    assert all(res['proposal_labels'][res['proposal_type'] == 2] == 0)


def test_ssn_test_prep_and_eval(ssn_dataset):
    ds = ssn_dataset
    res = ds.prepare_test_frames(0)
    n_props = len(ds.video_infos[0]['proposals'])
    assert res['proposal_tick_list'].shape == (n_props, 4)
    assert res['relative_proposal_list'].shape == (n_props, 2)
    # fabricate perfect detections: high score on the gt class
    num_classes = 3
    results = []
    for vi in ds.video_infos:
        props = np.array([[gt.start_frame / vi['total_frames'],
                           gt.end_frame / vi['total_frames']]
                          for gt in vi['gts']], np.float32)
        n = len(props)
        act = np.full((n, num_classes + 1), -5.0, np.float32)
        comp = np.full((n, num_classes), -5.0, np.float32)
        for i, gt in enumerate(vi['gts']):
            act[i, gt.label] = 5.0
            comp[i, gt.label - 1] = 5.0
        reg = np.zeros((n, num_classes, 2), np.float32)
        results.append((props, act, comp, reg))
    eval_results = ds.evaluate(results, metrics='mAP')
    assert eval_results['mAP@0.50'] == pytest.approx(1.0)
