"""Decoder-direct YUV 4:2:0 path: native libjpeg -> packed planes ->
device reconstruction, and the RawFrameDecodeYUV420 pipeline transform.

The production eval fast path (DAVIS 480p) never materializes RGB on
the host: the decoder emits the file's own YCbCr 4:2:0 values
(full-range 'jpeg' convention), the link carries 1.5 bytes/px, and the
device converts + normalizes fused ahead of conv1.
"""

import os

import numpy as np
import pytest

from vfs_tpu.ops.yuv import Yuv420Frames, yuv420_to_rgb


def _smooth_frames(t, h, w, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for i in range(t):
        chans = [127 + 80 * np.sin(2 * np.pi *
                                   (rng.uniform(0.3, 1.0) * yy / h +
                                    rng.uniform(0.3, 1.0) * xx / w) + 0.2 * i)
                 for _ in range(3)]
        frames.append(np.stack(chans, -1))
    return np.clip(np.stack(frames), 0, 255).astype(np.uint8)


def _write_jpegs(tmp_path, imgs, quality=95):
    from PIL import Image
    paths = []
    for i, f in enumerate(imgs):
        p = str(tmp_path / f'{i + 1:05d}.jpg')
        Image.fromarray(f).save(p, quality=quality)
        paths.append(p)
    return paths


def test_native_yuv420_decode_close_to_pil(tmp_path):
    from vfs_tpu.datasets.native_loader import (decode_jpeg_batch_yuv420,
                                                get_lib)
    if get_lib() is None:
        pytest.skip('native frame loader unavailable')
    from PIL import Image
    imgs = _smooth_frames(3, 64, 96, seed=4)
    paths = _write_jpegs(tmp_path, imgs)
    packed = decode_jpeg_batch_yuv420(paths)
    assert isinstance(packed, Yuv420Frames)
    assert packed.hw == (64, 96) and packed.convention == 'jpeg'
    assert packed.shape == (3, 64 * 96 * 3 // 2)
    rec = np.asarray(yuv420_to_rgb(np.asarray(packed), 64, 96,
                                   convention='jpeg'))
    ref = np.stack([np.asarray(Image.open(p).convert('RGB'))
                    for p in paths]).astype(np.float32)
    err = np.abs(rec - ref)
    # differs from PIL only by nearest-vs-fancy chroma upsampling (the
    # luma plane is the file's own samples either way)
    assert err.mean() < 8.0, err.mean()


def test_rawframe_decode_yuv420_transform(tmp_path):
    from vfs_tpu.datasets.pipelines.loading import RawFrameDecodeYUV420
    imgs = _smooth_frames(4, 48, 64, seed=1)
    _write_jpegs(tmp_path, imgs)
    tr = RawFrameDecodeYUV420()
    results = dict(frame_dir=str(tmp_path), filename_tmpl='{:05d}.jpg',
                   frame_inds=np.arange(1, 5))
    out = tr(results)
    packed = out['imgs']
    assert isinstance(packed, Yuv420Frames)
    assert out['original_shape'] == (48, 64)
    assert 'img_norm_cfg' in out
    rec = np.asarray(yuv420_to_rgb(np.asarray(packed), 48, 64,
                                   convention=packed.convention))
    assert np.abs(rec - imgs.astype(np.float32)).mean() < 8.0


def test_rawframe_decode_yuv420_cv2_fallback(tmp_path, monkeypatch):
    """Without the native library the transform packs via cv2 in the
    studio convention — same downstream contract."""
    from vfs_tpu.datasets import native_loader
    from vfs_tpu.datasets.pipelines.loading import RawFrameDecodeYUV420
    imgs = _smooth_frames(2, 48, 64, seed=2)
    _write_jpegs(tmp_path, imgs)
    monkeypatch.setattr(native_loader, 'get_lib', lambda: None)
    out = RawFrameDecodeYUV420()(dict(
        frame_dir=str(tmp_path), filename_tmpl='{:05d}.jpg',
        frame_inds=np.arange(1, 3)))
    packed = out['imgs']
    assert isinstance(packed, Yuv420Frames)
    assert packed.convention == 'studio'
    rec = np.asarray(yuv420_to_rgb(np.asarray(packed), 48, 64,
                                   convention='studio'))
    assert np.abs(rec - imgs.astype(np.float32)).mean() < 8.0


def test_davis_eval_with_yuv_decode_matches_rgb_pipeline(tmp_path):
    """End-to-end: a DavisDataset eval through RawFrameDecodeYUV420 (the
    packed transport all the way to the tracker) must agree with the
    plain RGB pipeline almost everywhere."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), '..'))
    from test_data.test_davis_e2e import make_mini_davis
    from vfs_tpu.apis.test import single_process_test
    from vfs_tpu.datasets import build_dataset
    from vfs_tpu.models import build_model

    ann, img_root, ann_root = make_mini_davis(str(tmp_path), num_videos=1,
                                              num_frames=4)
    norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
    base = dict(type='DavisDataset', ann_file=ann, data_prefix=img_root,
                anno_prefix=ann_root, data_root=str(tmp_path),
                test_mode=True)
    sampler = dict(type='SequentialSampleFrames', frame_interval=1)
    collect = dict(type='Collect', keys=['imgs', 'ref_seg_map'],
                   meta_keys=('frame_dir', 'frame_inds', 'original_shape',
                              'seg_map'))
    ds_yuv = build_dataset(dict(base, pipeline=[
        sampler, dict(type='RawFrameDecodeYUV420', **norm), collect]))
    ds_rgb = build_dataset(dict(base, pipeline=[
        sampler, dict(type='RawFrameDecode'),
        dict(type='Normalize', on_device=True, to_bgr=False, **norm),
        dict(type='FormatShape', input_format='NCTHW'), collect]))

    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(precede_frames=3, topk=3, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=8, with_first=True,
                      with_first_neighbor=True, batch_step=4))
    model.init_weights(input_shape=(1, 64, 96, 3))
    res_yuv = single_process_test(model, ds_yuv, progress=False)
    res_rgb = single_process_test(model, ds_rgb, progress=False)
    agree = float(np.mean([(np.asarray(a) == np.asarray(b)).mean()
                           for a, b in zip(res_yuv, res_rgb)]))
    assert agree > 0.9, agree
