"""End-to-end: synthetic mini-DAVIS -> pipeline -> VanillaTracker
propagation -> in-repo J&F evaluation."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from vfs_tpu.datasets import build_dataset
from vfs_tpu.datasets.davis_dataset import PALETTE
from vfs_tpu.models import build_model


def make_mini_davis(root, num_videos=2, num_frames=8, hw=(64, 96)):
    """Moving-square videos where color tracks the object -> propagation
    from frame-0 annotation should recover the objects."""
    h, w = hw
    img_root = osp.join(root, 'JPEGImages/480p')
    ann_root = osp.join(root, 'Annotations/480p')
    lines = []
    rng = np.random.RandomState(0)
    for v in range(num_videos):
        name = f'video{v}'
        os.makedirs(osp.join(img_root, name), exist_ok=True)
        os.makedirs(osp.join(ann_root, name), exist_ok=True)
        # two objects: colored squares moving right/down by 1px per frame
        base = rng.randint(0, 60, (h, w, 3), np.uint8)
        for t in range(num_frames):
            img = base.copy()
            ann = np.zeros((h, w), np.uint8)
            y1, x1 = 8 + t, 10 + t
            img[y1:y1 + 16, x1:x1 + 16] = [220, 40, 40]
            ann[y1:y1 + 16, x1:x1 + 16] = 1
            y2, x2 = 34, 50 + t
            img[y2:y2 + 14, x2:x2 + 14] = [40, 220, 60]
            ann[y2:y2 + 14, x2:x2 + 14] = 2
            Image.fromarray(img).save(
                osp.join(img_root, name, f'{t:05}.jpg'), quality=95)
            ann_img = Image.fromarray(ann)
            ann_img.putpalette(
                np.asarray(PALETTE, np.uint8).ravel())
            ann_img.save(osp.join(ann_root, name, f'{t:05}.png'))
        lines.append(f'{name} {num_frames} 0\n')
    ann_file = osp.join(root, 'val_list.txt')
    with open(ann_file, 'w') as f:
        f.writelines(lines)
    return ann_file, img_root, ann_root


@pytest.fixture(scope='module')
def mini_davis(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('davis'))
    return make_mini_davis(root)


VAL_PIPELINE = [
    dict(type='SequentialSampleFrames', frame_interval=1),
    dict(type='RawFrameDecode'),
    dict(type='Resize', scale=(-1, 64), keep_ratio=True),
    dict(type='Flip', flip_ratio=0),
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_bgr=False),
    dict(type='FormatShape', input_format='NCTHW'),
    dict(type='Collect', keys=['imgs', 'ref_seg_map'],
         meta_keys=('frame_dir', 'frame_inds', 'original_shape', 'seg_map')),
]


def test_davis_dataset_pipeline(mini_davis):
    ann_file, img_root, ann_root = mini_davis
    ds = build_dataset(dict(
        type='DavisDataset', ann_file=ann_file, data_prefix=img_root,
        anno_prefix=ann_root, data_root=osp.dirname(img_root),
        pipeline=VAL_PIPELINE, test_mode=True))
    assert len(ds) == 2
    sample = ds[0]
    imgs = sample['imgs']
    assert imgs.shape == (1, 8, 64, 96, 3)  # NCTHW key -> TPU NTHWC layout
    assert sample['ref_seg_map'].shape == (64, 96)
    assert set(np.unique(sample['ref_seg_map'])) == {0, 1, 2}
    assert sample['img_meta']['original_shape'] == (64, 96)


def test_vanilla_tracker_davis_eval(mini_davis):
    ann_file, img_root, ann_root = mini_davis
    ds = build_dataset(dict(
        type='DavisDataset', ann_file=ann_file, data_prefix=img_root,
        anno_prefix=ann_root, data_root=osp.dirname(img_root),
        pipeline=VAL_PIPELINE, test_mode=True))
    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(precede_frames=3, topk=5, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=12, with_first=True,
                      with_first_neighbor=True, batch_step=4))
    model.init_weights(input_shape=(1, 64, 96, 3))
    results = []
    for i in range(len(ds)):
        sample = ds[i]
        imgs = sample['imgs'][0]  # (T, H, W, C)
        preds = model.forward_test(imgs, sample['ref_seg_map'],
                                   [sample['img_meta']])
        results.extend(preds)
    assert len(results) == 2
    assert results[0].shape == (8, 64, 96)
    eval_results = ds.evaluate(results, metrics='davis')
    assert set(eval_results) == {
        'J&F-Mean', 'J-Mean', 'J-Recall', 'J-Decay', 'F-Mean', 'F-Recall',
        'F-Decay'}
    # random backbone still propagates *something*; metric must be a finite
    # probability-like number
    assert 0.0 <= eval_results['J&F-Mean'] <= 1.0


def test_tracker_kernel_tuning_keys_wired(mini_davis, monkeypatch):
    """Every documented test_cfg kernel-tuning key must actually reach
    PropagationConfig (pallas_fetch used to be silently dropped)."""
    from vfs_tpu.models.trackers import vanilla_tracker as vt
    ann_file, img_root, ann_root = mini_davis
    ds = build_dataset(dict(
        type='DavisDataset', ann_file=ann_file, data_prefix=img_root,
        anno_prefix=ann_root, data_root=osp.dirname(img_root),
        pipeline=VAL_PIPELINE, test_mode=True))
    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(precede_frames=3, topk=5, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=12, with_first=True,
                      with_first_neighbor=True, batch_step=4,
                      backend='pallas', pallas_tile=(8, 16),
                      pallas_scores='bfloat16', pallas_fetch='whole',
                      pallas_precision='bfloat16'))
    model.init_weights(input_shape=(1, 64, 96, 3))
    captured = {}
    real = vt.propagate_video

    def spy(feats, seg_first, mask, cfg):
        captured['cfg'] = cfg
        return real(feats, seg_first, mask,
                    cfg._replace(backend='tiled', pallas_scores='float32',
                                 pallas_fetch='perframe',
                                 pallas_precision='float32'))

    monkeypatch.setattr(vt, 'propagate_video', spy)
    sample = ds[0]
    model.forward_test(sample['imgs'][0], sample['ref_seg_map'],
                       [sample['img_meta']])
    cfg = captured['cfg']
    assert cfg.backend == 'pallas'
    assert cfg.pallas_tile == (8, 16)
    assert cfg.pallas_scores == 'bfloat16'
    assert cfg.pallas_fetch == 'whole'
    assert cfg.pallas_precision == 'bfloat16'


def test_davis_eval_perfect_predictions(mini_davis):
    """Feeding GT as predictions must give J&F == 1."""
    ann_file, img_root, ann_root = mini_davis
    ds = build_dataset(dict(
        type='DavisDataset', ann_file=ann_file, data_prefix=img_root,
        anno_prefix=ann_root, data_root=osp.dirname(img_root),
        pipeline=VAL_PIPELINE, test_mode=True))
    results = [ds._load_gt_masks(i) for i in range(len(ds))]
    eval_results = ds.evaluate(results, metrics='davis')
    assert eval_results['J&F-Mean'] == pytest.approx(1.0)
    assert eval_results['J-Mean'] == pytest.approx(1.0)
    assert eval_results['F-Mean'] == pytest.approx(1.0)


def test_vanilla_tracker_bf16_backbone(mini_davis):
    """model.backbone.dtype='bfloat16' (the eval speed knob): features
    are cast back to fp32 at the tracker seam so the fp32 propagation
    path (and the pallas kernel's fp32 buffers) still work."""
    import jax.numpy as jnp
    ann_file, img_root, ann_root = mini_davis
    ds = build_dataset(dict(
        type='DavisDataset', ann_file=ann_file, data_prefix=img_root,
        anno_prefix=ann_root, data_root=osp.dirname(img_root),
        pipeline=VAL_PIPELINE, test_mode=True))
    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                           dtype='bfloat16')),
        test_cfg=dict(precede_frames=3, topk=5, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=12, with_first=True,
                      with_first_neighbor=True, batch_step=4))
    model.init_weights(input_shape=(1, 64, 96, 3))
    feats = model._extract_feats(
        model.variables, jnp.zeros((4, 64, 96, 3), jnp.float32), 4)
    assert all(f.dtype == jnp.float32 for f in feats)
    sample = ds[0]
    preds = model.forward_test(sample['imgs'][0], sample['ref_seg_map'],
                               [sample['img_meta']])
    assert preds[0].shape == (8, 64, 96)


def test_extract_bulk_step_matches_uniform():
    """extract_bulk_step (bulk conv-batch + batch_step tail inside one
    jit) must produce the same features as the uniform batch_step path —
    the conv math is per-frame-independent, only the chunking changes."""
    import jax.numpy as jnp
    import numpy as np
    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(precede_frames=3, topk=5, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=12, with_first=True,
                      with_first_neighbor=True, batch_step=2))
    model.init_weights(input_shape=(1, 32, 48, 3))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(6, 32, 48, 3).astype(np.float32))
    base = model._extract_feats(model.variables, imgs, 2)
    # 6 = one bulk chunk of 4 + one tail chunk of 2
    bulk = model._extract_feats(model.variables, imgs, 2, bulk_step=4)
    # bulk_step larger than T falls back to the uniform path
    over = model._extract_feats(model.variables, imgs, 2, bulk_step=8)
    for b, u, o in zip(bulk, base, over):
        np.testing.assert_allclose(np.asarray(b), np.asarray(u),
                                   rtol=0, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(o), np.asarray(u))


def test_multi_device_eval_matches_single(mini_davis):
    """Round-robin multi-chip eval (single_process_test(devices=...)) must
    give bit-identical predictions and the same dataset order as the
    single-device loop."""
    import jax
    import numpy as np
    from vfs_tpu.apis import single_process_test
    ann_file, img_root, ann_root = mini_davis
    ds = build_dataset(dict(
        type='DavisDataset', ann_file=ann_file, data_prefix=img_root,
        anno_prefix=ann_root, data_root=osp.dirname(img_root),
        pipeline=VAL_PIPELINE, test_mode=True))
    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(precede_frames=3, topk=5, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=12, with_first=True,
                      with_first_neighbor=True, batch_step=4))
    model.init_weights(input_shape=(1, 64, 96, 3))
    ref = single_process_test(model, ds, progress=False, prefetch=False)
    par = single_process_test(model, ds, progress=False,
                              devices=jax.devices()[:4])
    assert len(ref) == len(par)
    for a, b in zip(ref, par):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pred_nibble_packing_lossless(mini_davis):
    """pack_preds (default on, <16 classes) halves the device->host
    readback; predictions must be bit-identical to the unpacked path."""
    ann_file, img_root, ann_root = mini_davis
    ds = build_dataset(dict(
        type='DavisDataset', ann_file=ann_file, data_prefix=img_root,
        anno_prefix=ann_root, data_root=osp.dirname(img_root),
        pipeline=VAL_PIPELINE, test_mode=True))
    sample = ds[0]
    outs = {}
    for packed in (True, False):
        model = build_model(
            dict(type='VanillaTracker',
                 backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
            test_cfg=dict(precede_frames=3, topk=5, temperature=0.07,
                          strides=(1, 2, 1, 1), out_indices=(2,),
                          neighbor_range=12, batch_step=4,
                          pack_preds=packed))
        model.init_weights(input_shape=(1, 64, 96, 3))
        outs[packed] = model.forward_test(
            sample['imgs'][0], sample['ref_seg_map'],
            [sample['img_meta']])[0]
    np.testing.assert_array_equal(outs[True], outs[False])
    # odd-width original shapes survive the pad/crop roundtrip, at every
    # adaptive bit width (1/2/4 bits per label — chosen per video from
    # the class count)
    from vfs_tpu.models.trackers.vanilla_tracker import VanillaTracker
    import jax.numpy as jnp
    for bits in (1, 2, 4):
        per = 8 // bits
        pred = (np.arange(33, dtype=np.uint8).reshape(3, 11)
                % (1 << bits))
        padded = np.pad(pred, ((0, 0), (0, -(-11 // per) * per - 11)))
        packed = padded[:, 0::per].copy()
        for i in range(1, per):
            packed |= padded[:, i::per] << (bits * i)
        got = VanillaTracker._fetch_preds(
            jnp.asarray(packed)[None], 1, (3, 11), bits)
        np.testing.assert_array_equal(got[0], pred)
    # legacy bool flag still means 4-bit nibbles
    pred = np.arange(15, dtype=np.uint8).reshape(3, 5) % 13
    packed_dev = jnp.asarray(
        np.pad(pred, ((0, 0), (0, 1)))[:, 0::2]
        | (np.pad(pred, ((0, 0), (0, 1)))[:, 1::2] << 4))[None]
    got = VanillaTracker._fetch_preds(packed_dev, 1, (3, 5), True)
    np.testing.assert_array_equal(got[0], pred)


@pytest.mark.parametrize('bits', [1, 2, 4])
def test_propagate_decode_device_pack_roundtrip(bits):
    """Device-side bit packing in _propagate_decode itself (not just the
    host unpack mirror): run the jit at each of 1/2/4 bits per label on
    synthetic features, round-trip through _fetch_preds, and compare to
    the unpacked (pack=0) run of the same inputs — must be identical.
    Odd output width exercises the pad/crop path."""
    import jax.numpy as jnp

    from vfs_tpu.models import build_model
    from vfs_tpu.ops.propagation import PropagationConfig

    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(precede_frames=3, topk=4, temperature=0.07))
    k = 1 << bits
    k_pad = max(((k + 3) // 4) * 4, 4)
    rng = np.random.RandomState(bits)
    t, h, w = 6, 8, 9
    feats = jnp.asarray(rng.randn(t, h, w, 16), jnp.float32)
    seg_first = np.zeros((h, w, k_pad), np.float32)
    seg_first[np.arange(h)[:, None], np.arange(w)[None],
              rng.randint(0, k, (h, w))] = 1.0
    class_valid = jnp.asarray(np.arange(k_pad) < k)
    cfg = PropagationConfig(precede_frames=3, topk=4, temperature=0.07,
                            backend='tiled', neighbor_range=8)
    out_hw = (23, 31)  # odd width: pad/crop roundtrip
    ref, _ = model._propagate_decode(
        feats=feats, seg_first=jnp.asarray(seg_first), mask=None,
        class_valid=class_valid, cfg=cfg, out_hw=out_hw, pack=0)
    packed, _ = model._propagate_decode(
        feats=feats, seg_first=jnp.asarray(seg_first), mask=None,
        class_valid=class_valid, cfg=cfg, out_hw=out_hw, pack=bits)
    got = model._fetch_preds(packed, t, out_hw, bits)
    np.testing.assert_array_equal(got, np.asarray(ref[:t]))
