"""DataLoader worker modes: the process pool must produce the same
batches as the thread path (deterministic pipeline), propagate worker
errors, and respect epoch-seeded ordering (reference torch DataLoader
process-worker semantics, mmaction/datasets/builder.py:43-117)."""

import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from vfs_tpu.datasets import build_dataloader, build_dataset


def make_rawframe_ds(tmp_path, num_videos=6, num_frames=4):
    import cv2
    root = str(tmp_path / 'frames')
    lines = []
    rng = np.random.RandomState(0)
    for v in range(num_videos):
        d = osp.join(root, f'vid{v}')
        os.makedirs(d)
        for i in range(1, num_frames + 1):
            cv2.imwrite(osp.join(d, f'img_{i:05d}.jpg'),
                        rng.randint(0, 255, (32, 48, 3), np.uint8))
        lines.append(f'vid{v} {num_frames} {v % 3}\n')
    ann = str(tmp_path / 'list.txt')
    open(ann, 'w').writelines(lines)
    # deterministic pipeline: no random augs, so thread/process batches
    # must be bit-identical
    pipeline = [
        dict(type='SampleFrames', clip_len=1, frame_interval=0, num_clips=2,
             test_mode=True, out_of_bound_opt='loop'),
        dict(type='RawFrameDecode'),
        dict(type='Resize', scale=(24, 24), keep_ratio=False),
        dict(type='Normalize', mean=[128, 128, 128], std=[64, 64, 64]),
        dict(type='FormatShape', input_format='NCTHW'),
        dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    ]
    return build_dataset(dict(type='RawframeDataset', ann_file=ann,
                              data_prefix=root, pipeline=pipeline))


def collect(loader):
    return [dict(b) for b in loader]


def test_process_pool_matches_threads(tmp_path):
    ds = make_rawframe_ds(tmp_path)
    thread = build_dataloader(ds, videos_per_gpu=2, workers_per_gpu=2,
                              shuffle=True, drop_last=True, seed=7,
                              worker_type='thread')
    proc = build_dataloader(ds, videos_per_gpu=2, workers_per_gpu=4,
                            shuffle=True, drop_last=True, seed=7,
                            worker_type='process')
    try:
        assert proc.worker_type == 'process'
        bt = collect(thread)
        bp = collect(proc)
        assert len(bt) == len(bp) == len(thread)
        for a, b in zip(bt, bp):
            np.testing.assert_array_equal(a['imgs'], b['imgs'])
            np.testing.assert_array_equal(a['label'], b['label'])
        # epoch-seeded reshuffle flows through the pool path too
        proc.set_epoch(1)
        bp2 = collect(proc)
        assert not all(
            np.array_equal(a['label'], b['label'])
            for a, b in zip(bp, bp2)) or len(bp) == 1
    finally:
        proc.close()


def test_process_pool_propagates_errors(tmp_path):
    ds = make_rawframe_ds(tmp_path, num_videos=4)
    # break one video's frames after dataset construction
    import shutil
    shutil.rmtree(osp.join(str(tmp_path / 'frames'), 'vid2'))
    # RawframeDataset test_mode=False retries corrupt samples forever, so
    # use test_mode to surface the error
    ds.test_mode = True
    loader = build_dataloader(ds, videos_per_gpu=2, workers_per_gpu=4,
                              shuffle=False, drop_last=False, seed=0,
                              worker_type='process')
    try:
        with pytest.raises(Exception):
            collect(loader)
    finally:
        loader.close()


def test_unpicklable_dataset_falls_back_to_threads(tmp_path):
    ds = make_rawframe_ds(tmp_path)
    ds._unpicklable = lambda: None  # local lambda defeats pickle
    loader = build_dataloader(ds, videos_per_gpu=2, workers_per_gpu=4,
                              shuffle=False, drop_last=True, seed=0,
                              worker_type='process')
    batches = collect(loader)
    assert loader.worker_type == 'thread'
    assert len(batches) == len(loader)
