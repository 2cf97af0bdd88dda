"""YUV 4:2:0 transport: host pack / device unpack / tracker integration.

The eval input path can ship planar I420 (1.5 bytes/px) instead of RGB
(3 bytes/px) over the host link and reconstruct RGB inside the
extraction jit (ops/yuv.py; knob ``test_cfg.input_format='yuv420'``).
These tests pin the cv2 convention, the numpy fallback, the round-trip
error bound, and end-to-end tracker agreement between transports.
"""

import numpy as np
import pytest

from vfs_tpu.ops import yuv


def _smooth_rgb(t, h, w, seed=0):
    """Natural-video-like smooth content: low-frequency color fields.
    Chroma-subsampling loss scales with within-2x2-block chroma
    variation — white noise (no spatial chroma correlation) would
    overstate it ~10x vs real frames (measured: cv2's own I420 round
    trip errs |14| mean on 4x-upsampled noise, ~1-2 on video)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for i in range(t):
        chans = []
        for c in range(3):
            fy, fx, ph = rng.uniform(0.5, 2.0, 3)
            chans.append(
                127 + 90 * np.sin(2 * np.pi * (fy * yy / h + fx * xx / w)
                                  + ph + 0.1 * i)
                + 30 * np.cos(2 * np.pi * (fx * yy / h - fy * xx / w)))
        frames.append(np.stack(chans, -1))
    return np.clip(np.stack(frames), 0, 255).astype(np.uint8)


def test_pack_matches_cv2():
    cv2 = pytest.importorskip('cv2')
    imgs = _smooth_rgb(2, 48, 64)
    packed = yuv.rgb_to_yuv420(imgs)
    ref = np.stack([
        cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420).reshape(-1) for f in imgs])
    assert packed.shape == ref.shape
    assert np.array_equal(packed, ref)


def test_numpy_fallback_matches_cv2(monkeypatch):
    pytest.importorskip('cv2')
    imgs = _smooth_rgb(1, 32, 40, seed=3)
    ref = yuv.rgb_to_yuv420(imgs).astype(np.int16)
    import builtins
    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == 'cv2':
            raise ImportError('forced')
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, '__import__', no_cv2)
    fallback = yuv.rgb_to_yuv420(imgs).astype(np.int16)
    # cv2 uses fixed-point arithmetic; the float fallback may differ by
    # one rounding step
    assert np.abs(fallback - ref).max() <= 1


def test_unpack_matches_cv2_inverse():
    """The device unpack must be the same transform cv2's own
    YUV2RGB_I420 applies (nearest chroma upsample + studio-swing BT.601
    inverse) — the exactness check that is content-independent."""
    cv2 = pytest.importorskip('cv2')
    imgs = _smooth_rgb(2, 48, 64, seed=1)
    packed = yuv.rgb_to_yuv420(imgs)
    rec = np.asarray(yuv.yuv420_to_rgb(packed, 48, 64))
    for i in range(2):
        ref = cv2.cvtColor(packed[i].reshape(-1, 64),
                           cv2.COLOR_YUV2RGB_I420).astype(np.float32)
        assert np.abs(rec[i] - ref).max() <= 1.0  # cv2 fixed-point rounding


def test_roundtrip_error_bounded():
    imgs = _smooth_rgb(2, 48, 64, seed=1)
    packed = yuv.rgb_to_yuv420(imgs)
    rec = np.asarray(yuv.yuv420_to_rgb(packed, 48, 64))
    assert rec.shape == (2, 48, 64, 3)
    err = np.abs(rec - imgs.astype(np.float32))
    # luma is near-exact; chroma subsampling bounds the mean error (the
    # sinusoid fixture's chroma gradients are ~10x steeper than video
    # frames — measured 5.6 here vs ~1.8 on blurred content)
    assert err.mean() < 8.0, err.mean()
    # pixels holding the stored chroma sample reconstruct near-exactly
    assert err[:, ::2, ::2].mean() < 1.0


def test_odd_sizes_padded():
    imgs = _smooth_rgb(1, 48, 64, seed=2)[:, :47, :63]
    packed = yuv.rgb_to_yuv420(imgs)
    he, we, n = yuv.yuv420_shape(47, 63)
    assert (he, we) == (48, 64) and packed.shape == (1, n)
    rec = np.asarray(yuv.yuv420_to_rgb(packed, 47, 63))
    assert rec.shape == (1, 47, 63, 3)
    err = np.abs(rec - imgs.astype(np.float32))
    assert err.mean() < 8.0, err.mean()
    assert err[:, ::2, ::2].mean() < 1.0


def test_planes_to_flat_layout():
    imgs = _smooth_rgb(1, 32, 40)
    packed = yuv.rgb_to_yuv420(imgs)
    hw = 32 * 40
    y = packed[:, :hw].reshape(1, 32, 40)
    u = packed[:, hw:hw + hw // 4].reshape(1, 16, 20)
    v = packed[:, hw + hw // 4:].reshape(1, 16, 20)
    assert np.array_equal(yuv.yuv420_planes_to_flat(y, u, v), packed)


def test_tracker_yuv_transport_agrees_with_rgb():
    """End-to-end: the yuv420 transport must reproduce the RGB path's
    predictions almost everywhere (chroma rounding may flip isolated
    boundary pixels)."""
    from vfs_tpu.models import build_model

    test_cfg = dict(precede_frames=3, topk=3, temperature=0.07,
                    strides=(1, 2, 1, 1), out_indices=(2,),
                    neighbor_range=8, with_first=True,
                    with_first_neighbor=True, batch_step=4)
    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(test_cfg))
    model.init_weights(input_shape=(1, 48, 64, 3))

    imgs = _smooth_rgb(4, 48, 64, seed=5)
    seg = np.zeros((48, 64), np.uint8)
    seg[10:30, 20:44] = 1
    meta = dict(original_shape=(48, 64),
                img_norm_cfg=dict(mean=np.array([123.675, 116.28, 103.53],
                                                np.float32),
                                  std=np.array([58.395, 57.12, 57.375],
                                               np.float32)))
    rgb_preds = model.forward_test(imgs, seg, [meta])[0]

    model.test_cfg['input_format'] = 'yuv420'
    handle = model.preload(imgs)
    assert handle[0] == 'preloaded_yuv'
    # the point of it all: 1.5 bytes/px on the link instead of 3
    # (preload pads T to the 20-frame compile bucket — compare per-frame)
    t_pad = handle[1].shape[0]
    assert handle[1].nbytes // t_pad == imgs[0].nbytes // 2
    yuv_preds = model.forward_test(handle, seg, [meta])[0]

    agreement = float((rgb_preds == yuv_preds).mean())
    # measured 0.958 with random-init weights on the chroma-steep
    # sinusoid fixture; real-weight real-content agreement is gated by
    # bench.py's fixture J&F with input_format='yuv420'
    assert agreement > 0.94, agreement
