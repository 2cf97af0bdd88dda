"""On-device augmentation (vfs_tpu/ops/device_aug.py) vs the host cv2
pipeline it replaces: each op is checked against its cv2/host counterpart
under FIXED parameters (augmentation randomness itself needs no parity —
the reference draws different numbers anyway), plus the end-to-end
config path: a SimSiam model trains from uint8 staging batches with the
full chain on device.

Host counterparts: vfs_tpu/datasets/pipelines/augmentations.py
(RandomResizedCrop :67, Flip :189, ColorJitter :252, RandomGrayScale
:306, RandomGaussianBlur :329), reference augmentations.py:171-1320.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfs_tpu.ops.device_aug import (build_device_aug, color_jitter,
                                    crop_resize, gaussian_blur, grayscale,
                                    sample_crop_rects)


def test_crop_resize_matches_cv2():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (48, 64, 3), np.uint8)
    y, x, ch, cw = 5, 9, 30, 40
    ref = cv2.resize(img[y:y + ch, x:x + cw].astype(np.float32), (16, 12),
                     interpolation=cv2.INTER_LINEAR)
    out = crop_resize(jnp.asarray(img[None], jnp.float32),
                      tuple(jnp.asarray([v], jnp.float32)
                            for v in (y, x, ch, cw)), (12, 16))
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-2)


def test_crop_resize_per_frame_rects():
    """Each frame gets its own rect: frame i crops a distinct solid
    region, so outputs must be the distinct solid colors."""
    imgs = np.zeros((2, 32, 32, 3), np.float32)
    imgs[0, :16, :16] = 10.0
    imgs[1, 16:, 16:] = 20.0
    rects = tuple(jnp.asarray(v, jnp.float32) for v in
                  ([0, 16], [0, 16], [16, 16], [16, 16]))
    out = np.asarray(crop_resize(jnp.asarray(imgs), rects, (8, 8)))
    assert np.allclose(out[0], 10.0)
    assert np.allclose(out[1], 20.0)


def test_crop_sampler_distribution():
    """Vectorized 10-attempt sampler: rects in bounds, areas within the
    requested range (up to rounding), center-square fallback engaged for
    impossible ranges."""
    key = jax.random.PRNGKey(0)
    hw = jnp.tile(jnp.asarray([[240.0, 320.0]]), (500, 1))
    y, x, ch, cw = sample_crop_rects(key, hw, (0.2, 1.0), (3 / 4, 4 / 3))
    y, x, ch, cw = (np.asarray(v) for v in (y, x, ch, cw))
    assert (y >= 0).all() and (x >= 0).all()
    assert (y + ch <= 240).all() and (x + cw <= 320).all()
    frac = (ch * cw) / (240 * 320)
    assert frac.min() >= 0.18 and frac.max() <= 1.01
    ar = cw / ch
    assert ar.min() >= 0.70 and ar.max() <= 1.40
    # spread across the range, not collapsed
    assert frac.std() > 0.1
    # impossible aspect at max area -> some fallback still valid
    y2, x2, ch2, cw2 = sample_crop_rects(
        jax.random.PRNGKey(1), hw[:8], (0.99, 1.0), (3.0, 3.1))
    assert (np.asarray(ch2) == 240).all()  # center min-side square
    assert (np.asarray(cw2) == 240).all()


def test_grayscale_matches_cv2():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (1, 20, 24, 3), np.uint8).astype(np.float32)
    out = np.asarray(grayscale(jnp.asarray(img), jnp.asarray([True])))
    ref = cv2.cvtColor(img[0].astype(np.uint8), cv2.COLOR_RGB2GRAY)
    np.testing.assert_allclose(out[0, ..., 0], ref, atol=1.0)
    np.testing.assert_array_equal(out[0, ..., 0], out[0, ..., 1])
    # apply=False is identity
    out2 = np.asarray(grayscale(jnp.asarray(img), jnp.asarray([False])))
    np.testing.assert_array_equal(out2, img)


def test_gaussian_blur_matches_cv2():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (1, 24, 28, 3), np.uint8).astype(np.float32)
    for sigma in (0.5, 1.2, 2.0):
        out = np.asarray(gaussian_blur(jnp.asarray(img),
                                       jnp.asarray([sigma]),
                                       jnp.asarray([True])))
        ref = cv2.GaussianBlur(img[0], (0, 0), sigma)
        np.testing.assert_allclose(out[0], ref, atol=2.5,
                                   err_msg=f'sigma={sigma}')
    # wide sigma needs a wider kernel: radius derives from 3*sigma
    out = np.asarray(gaussian_blur(jnp.asarray(img), jnp.asarray([4.0]),
                                   jnp.asarray([True]), max_radius=12))
    ref = cv2.GaussianBlur(img[0], (0, 0), 4.0)
    np.testing.assert_allclose(out[0], ref, atol=2.5)
    out = np.asarray(gaussian_blur(jnp.asarray(img), jnp.asarray([1.0]),
                                   jnp.asarray([False])))
    np.testing.assert_allclose(out[0], img[0], atol=1e-4)


def test_color_jitter_matches_host():
    """Fixed params through the host ColorJitter._apply (cv2 HSV) vs the
    device float-HSV version: within uint8-rounding tolerance."""
    from vfs_tpu.datasets.pipelines.augmentations import ColorJitter
    rng = np.random.RandomState(3)
    img = rng.randint(30, 220, (20, 24, 3), np.uint8)
    order = (3, 0, 2, 1)
    params = (1.2, 0.9, 1.3, 0.03, order)
    ref = ColorJitter._apply(img, params).astype(np.float32)
    out = np.asarray(color_jitter(
        jnp.asarray(img[None], jnp.float32),
        *(jnp.asarray([v], jnp.float32) for v in params[:4]),
        jnp.asarray([True]),
        jnp.asarray([order], jnp.int32)))
    # host path quantizes to uint8 before/after HSV; allow that rounding
    assert np.abs(out[0] - ref).mean() < 3.0
    assert np.median(np.abs(out[0] - ref)) < 2.0


def test_build_device_aug_end_to_end_shapes_and_flags():
    transforms = [
        dict(type='RandomResizedCrop', area_range=(0.2, 1.0),
             same_on_clip=False, same_across_clip=False),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Flip', flip_ratio=0.5, same_on_clip=False,
             same_across_clip=False),
        dict(type='ColorJitter', brightness=0.4, contrast=0.4,
             saturation=0.4, hue=0.1, p=0.8, same_on_clip=False,
             same_across_clip=False),
        dict(type='RandomGrayScale', p=0.2),
        dict(type='RandomGaussianBlur', p=0.5),
    ]
    norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
    fn = build_device_aug(transforms, norm)
    rng = np.random.RandomState(4)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 2, 3, 40, 48, 3), np.uint8))
    orig = jnp.asarray([[120, 160], [90, 100]], jnp.int32)
    out = jax.jit(fn)(imgs, orig, jax.random.PRNGKey(0))
    assert out.shape == (2, 2, 3, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())
    # normalized stats in a sane range
    assert abs(float(out.mean())) < 2.0
    # different keys give different augmentations
    out2 = jax.jit(fn)(imgs, orig, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_device_aug_same_on_clip_broadcast():
    """same_on_clip=True must give every frame of a clip the same crop:
    feed frames that are identical within a clip — outputs must match
    frame-to-frame."""
    transforms = [
        dict(type='RandomResizedCrop', area_range=(0.3, 0.9)),
        dict(type='Resize', scale=(16, 16), keep_ratio=False),
    ]
    fn = build_device_aug(transforms, dict(mean=[0.0] * 3, std=[1.0] * 3))
    rng = np.random.RandomState(5)
    frame = rng.randint(0, 255, (24, 24, 3), np.uint8)
    imgs = jnp.asarray(np.broadcast_to(frame, (1, 2, 4, 24, 24, 3)))
    orig = jnp.asarray([[24, 24]], jnp.int32)
    out = np.asarray(fn(imgs, orig, jax.random.PRNGKey(2)))
    for n in range(2):
        for t in range(1, 4):
            np.testing.assert_array_equal(out[0, n, t], out[0, n, 0])


def test_build_device_aug_rejects_unknown_kwargs():
    """Host-only kwargs (same_clip_indices) and typos must fail loudly —
    a silently different augmentation distribution is worse than an
    error."""
    norm = dict(mean=[0.0] * 3, std=[1.0] * 3)
    with pytest.raises(ValueError, match='same_clip_indices'):
        build_device_aug([dict(type='Flip', flip_ratio=0.5,
                               same_clip_indices=(0,))], norm)
    with pytest.raises(ValueError, match='flip_ration'):
        build_device_aug([dict(type='Flip', flip_ration=0.5)], norm)
    with pytest.raises(ValueError, match='img_norm_cfg'):
        build_device_aug([dict(type='Flip')], None)
    # a Resize inside the chain resolves fn.out_hw
    fn = build_device_aug([
        dict(type='RandomResizedCrop'),
        dict(type='Resize', scale=(112, 96), keep_ratio=False)], norm)
    assert fn.out_hw == (96, 112)


def test_localizer_eval_step_is_deterministic():
    """The val loss runs in eval mode: dropout off, so two different rng
    keys must give identical losses (PEM has dropout_ratio>0)."""
    import optax

    from vfs_tpu.apis.train_localizer import (_create_state_from_sample,
                                              make_localizer_eval_step)
    from vfs_tpu.models import build_model as _build

    model = _build(dict(
        type='PEM', pem_feat_dim=8, pem_hidden_dim=16, pem_u_ratio_m=1.0,
        pem_u_ratio_l=2.0, pem_high_temporal_iou_threshold=0.6,
        pem_low_temporal_iou_threshold=0.2, soft_nms_alpha=0.75,
        soft_nms_low_threshold=0.65, soft_nms_high_threshold=0.9,
        post_process_top_k=100))
    rng = np.random.RandomState(8)
    batch = dict(bsp_feature=[rng.randn(16, 8).astype(np.float32)
                              for _ in range(2)],
                 reference_temporal_iou=[rng.rand(16).astype(np.float32)
                                         for _ in range(2)])
    tx = optax.sgd(0.01)
    state = _create_state_from_sample(model, jax.random.PRNGKey(0), batch,
                                      tx, 'PEM')
    from vfs_tpu.apis.train_localizer import _KINDS
    tensors = {k: np.asarray(v) for k, v in
               _KINDS['PEM'][0](model, batch).items()}
    ev = jax.jit(make_localizer_eval_step(model, 'PEM'))
    l1 = ev(state, tensors, jax.random.PRNGKey(1))
    l2 = ev(state, tensors, jax.random.PRNGKey(2))
    assert float(l1['loss']) == float(l2['loss'])


def test_device_aug_sharded_over_mesh():
    """The chain shards cleanly over a data mesh (all ops are per-sample
    — GSPMD splits the batch; the depthwise blur conv groups stay within
    a shard) and matches the unsharded result for the same key."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vfs_tpu.parallel import create_mesh
    mesh = create_mesh(('data',))
    if mesh.devices.size < 2:
        pytest.skip('needs the multi-device CPU mesh')
    transforms = [
        dict(type='RandomResizedCrop', area_range=(0.3, 1.0),
             same_on_clip=False, same_across_clip=False),
        dict(type='Resize', scale=(16, 16), keep_ratio=False),
        dict(type='Flip', flip_ratio=0.5),
        dict(type='RandomGaussianBlur', p=1.0),
    ]
    fn = build_device_aug(transforms, dict(mean=[128.0] * 3,
                                           std=[64.0] * 3))
    rng = np.random.RandomState(7)
    nd = mesh.devices.size
    imgs = jnp.asarray(rng.randint(0, 255, (nd, 1, 2, 24, 24, 3),
                                   np.uint8))
    orig = jnp.asarray([[24, 24]] * nd, jnp.int32)
    ref = np.asarray(jax.jit(fn)(imgs, orig, jax.random.PRNGKey(3)))
    sharding = NamedSharding(mesh, P('data'))
    imgs_s = jax.device_put(imgs, sharding)
    orig_s = jax.device_put(orig, sharding)
    out = np.asarray(jax.jit(fn)(imgs_s, orig_s, jax.random.PRNGKey(3)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_simsiam_trains_with_device_aug(tmp_path):
    """Full config path: DeviceAug pipeline ships uint8 staging batches,
    cfg.device_aug runs the chain in the train step, SimSiam trains."""
    import os.path as osp

    from vfs_tpu.apis.train import train_model
    from vfs_tpu.datasets import build_dataset
    from vfs_tpu.models import build_model
    from vfs_tpu.utils import Config

    rng = np.random.RandomState(6)
    frames_root = tmp_path / 'frames'
    lines = []
    for v in range(2):
        d = frames_root / f'vid{v}'
        d.mkdir(parents=True)
        for i in range(1, 9):
            cv2.imwrite(str(d / f'img_{i:05d}.jpg'),
                        rng.randint(0, 255, (48, 64, 3), np.uint8))
        lines.append(f'vid{v} 8 0\n')
    ann = tmp_path / 'train.txt'
    ann.write_text(''.join(lines))

    transforms = [
        dict(type='RandomResizedCrop', area_range=(0.2, 1.0),
             same_on_clip=False, same_across_clip=False),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Flip', flip_ratio=0.5, same_on_clip=False,
             same_across_clip=False),
    ]
    cfg = Config(dict(
        model=dict(
            type='SimSiamBaseTracker',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,)),
            img_head=dict(type='SimSiamHead', in_channels=512,
                          norm_cfg=dict(type='SyncBN'),
                          num_projection_fcs=3, projection_mid_channels=64,
                          projection_out_channels=64, num_predictor_fcs=2,
                          predictor_mid_channels=32,
                          predictor_out_channels=64, with_norm=True,
                          loss_feat=dict(type='CosineSimLoss',
                                         negative=False),
                          spatial_type='avg')),
        device_aug=dict(transforms=transforms, out_hw=(32, 32)),
        img_norm_cfg=dict(mean=[123.675, 116.28, 103.53],
                          std=[58.395, 57.12, 57.375]),
        data=dict(videos_per_gpu=2, workers_per_gpu=0),
        optimizer=dict(type='SGD', lr=0.01, momentum=0.9),
        total_epochs=1,
        work_dir=str(tmp_path / 'work')))
    pipeline = [
        dict(type='SampleFrames', clip_len=1, frame_interval=0,
             num_clips=4, out_of_bound_opt='loop'),
        dict(type='Clip2Frame', clip_len=2),
        dict(type='RawFrameDecode'),
        dict(type='DeviceAug', scale=(48, 40)),
        dict(type='Collect', keys=['imgs', 'orig_hw'], meta_keys=()),
    ]
    dataset = build_dataset(dict(
        type='RawframeDataset', ann_file=str(ann),
        data_prefix=str(frames_root), pipeline=pipeline,
        filename_tmpl='img_{:05d}.jpg'))
    sample = dataset[0]
    assert sample['imgs'].shape == (2, 2, 40, 48, 3)
    assert sample['imgs'].dtype == np.uint8
    assert tuple(sample['orig_hw']) == (48, 64)

    model = build_model(cfg.model, train_cfg=dict(intra_video=False))
    state = train_model(model, dataset, cfg)
    assert int(state.step) == 1
    assert osp.exists(str(tmp_path / 'work' / 'checkpoints' / 'step_1'))


def test_split_device_aug_pipeline_rules():
    """The bench splitter keeps host prep in order, refuses interleaved
    host-only transforms, and leaves keep_ratio resizes on the host."""
    import os.path as osp
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), '../..'))
    from tools.analysis.bench_pretrain import split_device_aug_pipeline

    pipe = [
        dict(type='DecordInit'),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256), keep_ratio=True),  # host prep
        dict(type='RandomResizedCrop'),
        dict(type='Resize', scale=(224, 224), keep_ratio=False),
        dict(type='Flip', flip_ratio=0.5),
        dict(type='Normalize', mean=[0] * 3, std=[1] * 3),
        dict(type='Collect', keys=['imgs'], meta_keys=()),
    ]
    host, device = split_device_aug_pipeline(pipe, (256, 320))
    assert [t['type'] for t in host] == [
        'DecordInit', 'DecordDecode', 'Resize', 'DeviceAug', 'Collect']
    assert host[2]['keep_ratio'] is True
    assert [t['type'] for t in device] == ['RandomResizedCrop', 'Resize',
                                           'Flip']
    # a host-only transform after device ops must fail loudly
    bad = pipe[:6] + [dict(type='RandomErasing')] + pipe[6:]
    with pytest.raises(ValueError, match='RandomErasing'):
        split_device_aug_pipeline(bad, (256, 320))


def test_proc_worker_seeds_python_random(tmp_path):
    """Process-pool workers must seed BOTH numpy and stdlib random —
    MultiScaleCrop/RandomResizedCrop draw from the stdlib stream."""
    import random

    from vfs_tpu.datasets.builder import _proc_init

    import multiprocessing

    c1 = multiprocessing.get_context('spawn').Value('i', 0)
    _proc_init(None, 123, c1)
    a = (random.random(), np.random.rand())
    c2 = multiprocessing.get_context('spawn').Value('i', 0)
    _proc_init(None, 123, c2)
    b = (random.random(), np.random.rand())
    assert a == b  # same seed + worker ordinal -> identical streams
    # second worker from the same counter draws a DIFFERENT stream
    _proc_init(None, 123, c2)
    c = (random.random(), np.random.rand())
    assert c != b
