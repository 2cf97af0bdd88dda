"""JHMDB (pose PCK) and VIP (mIoU) propagation datasets end-to-end on
synthetic fixtures."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from vfs_tpu.datasets import build_dataset
from vfs_tpu.models import build_model

IMG_NORM = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_bgr=False)


def make_jhmdb(root, num_videos=1, num_frames=6, hw=(64, 80)):
    import scipy.io as sio
    h, w = hw
    img_root = osp.join(root, 'Frames')
    ann_root = osp.join(root, 'anno', 'Frames')
    rng = np.random.RandomState(0)
    lines = []
    for v in range(num_videos):
        name = f'cls/video{v}'
        os.makedirs(osp.join(img_root, name), exist_ok=True)
        pose_dir = osp.join(root, 'anno', 'joint_positions', name)
        os.makedirs(pose_dir, exist_ok=True)
        base = rng.randint(0, 80, (h, w, 3), np.uint8)
        pos = np.zeros((2, 15, num_frames))
        for t in range(num_frames):
            img = base.copy()
            for j in range(15):
                x = 10 + 4 * j % (w - 12) + t
                y = 8 + 3 * j % (h - 10) + t
                img[y - 2:y + 3, x - 2:x + 3] = [(40 + 14 * j) % 255,
                                                 (200 - 9 * j) % 255, 90]
                pos[0, j, t] = x + 1  # 1-indexed like the .mat
                pos[1, j, t] = y + 1
            Image.fromarray(img).save(
                osp.join(img_root, name, f'{t + 1:05}.png'))
        sio.savemat(osp.join(pose_dir, 'joint_positions.mat'),
                    {'pos_img': pos})
        lines.append(f'{name} {num_frames} 0\n')
    ann_file = osp.join(root, 'val_list.txt')
    with open(ann_file, 'w') as f:
        f.writelines(lines)
    return ann_file, img_root, osp.join(root, 'anno', 'Frames')


def test_jhmdb_end_to_end(tmp_path):
    ann_file, img_root, ann_root = make_jhmdb(str(tmp_path))
    pipeline = [
        dict(type='SequentialSampleFrames', frame_interval=1),
        dict(type='RawFrameDecode'),
        dict(type='Resize', scale=(-1, 64), keep_ratio=True),
        dict(type='Flip', flip_ratio=0),
        dict(type='Normalize', **IMG_NORM),
        dict(type='FormatShape', input_format='NCTHW'),
        dict(type='Collect', keys=['imgs', 'ref_seg_map'],
             meta_keys=('frame_dir', 'frame_inds', 'original_shape',
                        'seg_map')),
    ]
    ds = build_dataset(dict(
        type='JHMDBDataset', ann_file=ann_file, data_prefix=img_root,
        anno_prefix=ann_root, data_root=str(tmp_path), pipeline=pipeline,
        test_mode=True))
    sample = ds[0]
    assert sample['ref_seg_map'].shape[-1] == 15  # pose heatmaps
    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(precede_frames=3, topk=5, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=12, batch_step=3))
    model.init_weights(input_shape=(1, 64, 80, 3))
    results = []
    for i in range(len(ds)):
        s = ds[i]
        preds = model.forward_test(s['imgs'][0], s['ref_seg_map'],
                                   [s['img_meta']])
        results.extend(preds)
    assert results[0].shape == (6, 15, 64, 80)  # (T, K, H, W) heatmaps
    eval_results = ds.evaluate(results, metrics='pck')
    assert set(eval_results) == {f'PCK@{a}'
                                 for a in (0.1, 0.2, 0.3, 0.4, 0.5)}
    for v in eval_results.values():
        assert 0 <= v <= 100


def make_vip(root, num_videos=1, num_frames=5, hw=(48, 64)):
    import cv2
    h, w = hw
    img_root = osp.join(root, 'Images')
    ann_root = osp.join(root, 'Annotations')
    from vfs_tpu.datasets.davis_dataset import PALETTE
    rng = np.random.RandomState(1)
    lines = []
    for v in range(num_videos):
        name = f'videos{v}'
        os.makedirs(osp.join(img_root, name), exist_ok=True)
        os.makedirs(osp.join(ann_root, name), exist_ok=True)
        base = rng.randint(0, 60, (h, w, 3), np.uint8)
        for t in range(num_frames):
            img = base.copy()
            ann = np.zeros((h, w), np.uint8)
            y, x = 10 + t, 12 + t
            img[y:y + 14, x:x + 14] = [210, 60, 50]
            ann[y:y + 14, x:x + 14] = 4  # upper-clothes
            cv2.imwrite(osp.join(img_root, name, f'{t:012}.jpg'),
                        img[..., ::-1])
            a = Image.fromarray(ann)
            a.putpalette(np.asarray(PALETTE, np.uint8).ravel())
            a.save(osp.join(ann_root, name, f'{t:012}.png'))
        lines.append(f'{name} {num_frames} 0\n')
    ann_file = osp.join(root, 'val_list.txt')
    with open(ann_file, 'w') as f:
        f.writelines(lines)
    return ann_file, img_root, ann_root


def test_vip_end_to_end(tmp_path):
    ann_file, img_root, ann_root = make_vip(str(tmp_path))
    pipeline = [
        dict(type='SequentialSampleFrames', frame_interval=1),
        dict(type='RawFrameDecode'),
        dict(type='Resize', scale=(-1, 48), keep_ratio=True),
        dict(type='Flip', flip_ratio=0),
        dict(type='Normalize', **IMG_NORM),
        dict(type='FormatShape', input_format='NCTHW'),
        dict(type='Collect', keys=['imgs', 'ref_seg_map'],
             meta_keys=('frame_dir', 'frame_inds', 'original_shape',
                        'seg_map')),
    ]
    ds = build_dataset(dict(
        type='VIPDataset', ann_file=ann_file, data_prefix=img_root,
        anno_prefix=ann_root, data_root=str(tmp_path), pipeline=pipeline,
        test_mode=True))
    sample = ds[0]
    assert sample['ref_seg_map'].dtype == np.uint8
    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(precede_frames=2, topk=5, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=12, batch_step=5))
    model.init_weights(input_shape=(1, 48, 64, 3))
    results = []
    for i in range(len(ds)):
        s = ds[i]
        preds = model.forward_test(s['imgs'][0], s['ref_seg_map'],
                                   [s['img_meta']])
        results.extend(preds)
    eval_results = ds.evaluate(results, metrics='mIoU')
    assert {'mIoU', 'mAcc', 'aAcc'} <= set(eval_results)
    # GT as predictions gives mIoU == 1 on present classes
    gt_results = []
    for i in range(len(ds)):
        frames = []
        adir = osp.join(ann_root, f'videos{i}')
        for f in sorted(os.listdir(adir)):
            frames.append(np.asarray(Image.open(osp.join(adir, f))))
        gt_results.append(np.stack(frames))
    perfect = ds.evaluate(gt_results, metrics='mIoU')
    assert perfect['aAcc'] == pytest.approx(1.0)
