"""SimSiam pretraining smoke tests: loss math parity + a real train_model
run over the 8-device CPU mesh with synthetic videos (reference test
pattern: tests/test_train.py fake-dataset integration)."""

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfs_tpu.models import build_model
from vfs_tpu.models.trackers.sim_siam_tracker import parse_losses
from vfs_tpu.utils import Config


def make_video_dataset(root, num_videos=4, num_frames=12, hw=(48, 64)):
    import cv2
    os.makedirs(root, exist_ok=True)
    lines = []
    rng = np.random.RandomState(0)
    for v in range(num_videos):
        path = osp.join(root, f'vid{v}.mp4')
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'),
                                 10, (hw[1], hw[0]))
        for t in range(num_frames):
            frame = rng.randint(0, 255, (hw[0], hw[1], 3), np.uint8)
            writer.write(frame)
        writer.release()
        lines.append(f'vid{v}.mp4 0\n')
    ann = osp.join(root, 'list.txt')
    with open(ann, 'w') as f:
        f.writelines(lines)
    return ann


MODEL_CFG = dict(
    type='SimSiamBaseTracker',
    backbone=dict(type='ResNet', depth=18, out_indices=(3,)),
    img_head=dict(
        type='SimSiamHead', in_channels=512, num_projection_fcs=3,
        projection_mid_channels=64, projection_out_channels=64,
        num_predictor_fcs=2, predictor_mid_channels=32,
        predictor_out_channels=64, with_norm=True,
        loss_feat=dict(type='CosineSimLoss', negative=False),
        spatial_type='avg'))


def test_simsiam_forward_loss_structure():
    model = build_model(MODEL_CFG, train_cfg=dict(intra_video=True))
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(2, 2, 3, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=True)
    losses, _ = model.apply(variables, imgs, train=True,
                            mutable=['batch_stats'])
    # intra_video=True with clip_len=3 -> loss terms 0,1,2
    assert set(losses) == {'img_head.0.loss_feat', 'img_head.1.loss_feat',
                           'img_head.2.loss_feat'}
    total, log_vars = parse_losses(losses)
    assert jnp.isfinite(total)
    assert 'loss' in log_vars
    # cosine loss is bounded in [0, 4]; each term weighted 1/clip_len
    assert 0 <= float(total) <= 4.0


def test_simsiam_no_intra_video():
    model = build_model(MODEL_CFG, train_cfg=dict(intra_video=False))
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(1, 2, 2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=True)
    losses, _ = model.apply(variables, imgs, train=True,
                            mutable=['batch_stats'])
    assert set(losses) == {'img_head.0.loss_feat'}


def test_train_model_end_to_end(tmp_path):
    """Two epochs over the CPU mesh: loss finite, params change,
    checkpoints written, auto-resume restores."""
    ann = make_video_dataset(str(tmp_path / 'videos'))
    cfg = Config.fromdict(dict(
        work_dir=str(tmp_path / 'work'),
        seed=0,
        auto_resume=True,
        data=dict(videos_per_gpu=8, workers_per_gpu=2),
        optimizer=dict(type='SGD', lr=0.01, momentum=0.9,
                       weight_decay=1e-4),
        optimizer_config=dict(grad_clip=None),
        lr_config=dict(policy='CosineAnnealing', min_lr=0, by_epoch=False),
        total_epochs=2,
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=1),
    ))
    train_pipeline = [
        dict(type='OpenCVInit'),
        dict(type='SampleFrames', clip_len=1, frame_interval=0, num_clips=4,
             out_of_bound_opt='loop'),
        dict(type='Clip2Frame', clip_len=2),
        dict(type='OpenCVDecode'),
        dict(type='RandomResizedCrop', area_range=(0.2, 1.0),
             same_on_clip=False, same_across_clip=False),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Flip', flip_ratio=0.5, same_on_clip=False,
             same_across_clip=False),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_bgr=False),
        dict(type='FormatShape', input_format='NCTHW'),
        dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    ]
    from vfs_tpu.apis.train import train_model
    from vfs_tpu.datasets import build_dataset

    dataset = build_dataset(dict(
        type='RepeatDataset', times=2,
        dataset=dict(type='VideoDataset', ann_file=ann,
                     data_prefix=osp.dirname(ann),
                     pipeline=train_pipeline)))
    assert len(dataset) == 8
    model = build_model(MODEL_CFG, train_cfg=dict(intra_video=True))
    state = train_model(model, dataset, cfg)
    assert int(state.step) == 2  # 8 samples / batch 8 = 1 iter x 2 epochs
    ckpt_dir = str(tmp_path / 'work' / 'checkpoints')
    assert osp.isdir(osp.join(ckpt_dir, 'step_2'))
    # auto-resume: running again does nothing new but restores cleanly
    state2 = train_model(model, dataset, cfg)
    assert int(state2.step) == 2


def test_mixed_precision_train_step():
    """bf16 mixed precision (reference Fp16OptimizerHook equivalent):
    apply_mixed_precision rewrites the backbone dtype, master params /
    optimizer / BN stats stay fp32, the bf16 step tracks the fp32 step
    closely but NOT bit-identically (proof the half path engaged)."""
    import copy

    import optax
    from vfs_tpu.apis.train import (TrainState, apply_mixed_precision,
                                    make_train_step)
    from vfs_tpu.utils import Config

    cfg16 = Config(dict(model=copy.deepcopy(MODEL_CFG), fp16=dict()))
    assert apply_mixed_precision(cfg16)
    assert cfg16.model['backbone']['dtype'] == jnp.bfloat16

    imgs = jnp.asarray(
        np.random.RandomState(1).randn(2, 2, 3, 32, 32, 3), jnp.float32)
    tx = optax.sgd(0.05, momentum=0.9)
    steps = {}
    for name, mcfg, mixed in [('fp32', MODEL_CFG, False),
                              ('bf16', cfg16.model, True)]:
        model = build_model(mcfg, train_cfg=dict(intra_video=False))
        variables = model.init(jax.random.PRNGKey(0), imgs, train=True)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables['params'],
                           batch_stats=variables.get('batch_stats', {}),
                           opt_state=tx.init(variables['params']))
        step = jax.jit(make_train_step(model, tx, mixed_precision=mixed))
        steps[name] = step(state, imgs)

    s16, log16 = steps['bf16']
    s32, log32 = steps['fp32']
    # master state stays fp32 (param_dtype decoupled from compute dtype)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(s16.params))
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(s16.batch_stats)
               if jnp.issubdtype(l.dtype, jnp.floating))
    l32, l16 = float(log32['loss']), float(log16['loss'])
    assert np.isfinite(l16)
    assert abs(l32 - l16) < 0.05
    # half-precision path actually engaged: losses must not be identical
    assert l32 != l16
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     s32.params, s16.params)
    assert 0 < max(jax.tree.leaves(d)) < 0.2


def test_uint8_on_device_normalize_train_step():
    """Normalize(on_device=True) train path: a uint8 batch + img_norm_cfg
    in the step must produce the SAME loss/params as host-side
    normalization of the same frames (numerically identical by design)."""
    import optax
    from vfs_tpu.apis.train import TrainState, make_train_step

    rng = np.random.RandomState(2)
    raw = rng.randint(0, 256, (2, 2, 3, 32, 32, 3), np.uint8)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    host_norm = jnp.asarray((raw.astype(np.float32) - mean) / std)

    tx = optax.sgd(0.05, momentum=0.9)
    model = build_model(MODEL_CFG, train_cfg=dict(intra_video=False))
    variables = model.init(jax.random.PRNGKey(0), host_norm, train=True)

    def fresh_state():
        return TrainState(step=jnp.zeros((), jnp.int32),
                          params=variables['params'],
                          batch_stats=variables.get('batch_stats', {}),
                          opt_state=tx.init(variables['params']))

    step_f32 = jax.jit(make_train_step(model, tx))
    _, log_f32 = step_f32(fresh_state(), host_norm)

    step_u8 = jax.jit(make_train_step(
        model, tx, norm_cfg=dict(mean=mean, std=std)))
    _, log_u8 = step_u8(fresh_state(), jnp.asarray(raw))
    assert float(log_f32['loss']) == pytest.approx(
        float(log_u8['loss']), abs=1e-6)

    # without norm_cfg a uint8 batch must fail loudly, not train garbage
    step_bad = jax.jit(make_train_step(model, tx))
    with pytest.raises(ValueError, match='img_norm_cfg'):
        step_bad(fresh_state(), jnp.asarray(raw))


def test_train_norm_cfg_follows_pipeline_not_toplevel():
    """The on-device normalize must use the constants of the pipeline's
    actual Normalize transform — cfg.img_norm_cfg is only a convention
    and can differ (e.g. reused for another modality)."""
    from vfs_tpu.apis.train import _pipeline_norm_cfg
    from vfs_tpu.datasets.dataset_wrappers import RepeatDataset
    from vfs_tpu.datasets.pipelines import Compose

    pipeline_mean = [100.0, 100.0, 100.0]

    class _Stub:
        def __len__(self):
            return 1

    stub = _Stub()
    stub.pipeline = Compose([
        dict(type='Normalize', mean=pipeline_mean, std=[50.0] * 3,
             on_device=True)])
    got = _pipeline_norm_cfg(stub)
    np.testing.assert_array_equal(got['mean'], pipeline_mean)
    np.testing.assert_array_equal(got['std'], [50.0] * 3)
    # unwraps dataset wrappers
    wrapped = RepeatDataset(stub, times=2)
    got2 = _pipeline_norm_cfg(wrapped)
    np.testing.assert_array_equal(got2['mean'], pipeline_mean)
    # no Normalize in the pipeline -> None (caller falls back)
    stub2 = _Stub()
    stub2.pipeline = Compose([])
    assert _pipeline_norm_cfg(stub2) is None


def test_train_honors_backbone_pretrained(tmp_path):
    """cfg.model.backbone.pretrained must initialize the train state's
    backbone through the torchvision bridge (reference
    BaseTracker.init_weights loads it; this used to be silently
    ignored)."""
    import logging

    import torch

    from vfs_tpu.apis.train import (TrainState, _load_backbone_pretrained,
                                    create_train_state)
    from vfs_tpu.checkpoint import torchvision_to_flax_resnet
    from vfs_tpu.utils import Config
    import optax
    from test_parity_torch import _fabricated_tv_state_dict
    sd = _fabricated_tv_state_dict(18)
    pth = str(tmp_path / 'r18.pth')
    torch.save(sd, pth)

    model = build_model(dict(MODEL_CFG, backbone=dict(
        MODEL_CFG['backbone'], pretrained=pth)),
        train_cfg=dict(intra_video=False))
    tx = optax.sgd(0.1)
    sample = {'imgs': np.zeros((1, 2, 2, 32, 32, 3), np.float32)}
    state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    cfg = Config(dict(model=dict(MODEL_CFG, backbone=dict(
        MODEL_CFG['backbone'], pretrained=pth))))
    state2 = _load_backbone_pretrained(state, cfg,
                                       logging.getLogger('t'))
    want, want_stats = torchvision_to_flax_resnet(
        {k: t.numpy() for k, t in sd.items()})
    got = state2.params['_backbone']['conv1']['conv']['kernel']
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want['conv1']['conv']['kernel']))
    # untouched head params keep their init
    np.testing.assert_allclose(
        np.asarray(state2.params['_img_head']['projection_fc0']['fc']
                   ['kernel']),
        np.asarray(state.params['_img_head']['projection_fc0']['fc']
                   ['kernel']))


def test_backbone_pretrained_guards(tmp_path):
    """backbone.pretrained must fail loudly for non-ResNet backbones and
    mismatched checkpoints instead of installing a broken tree."""
    import logging

    import optax
    import torch

    from test_parity_torch import _fabricated_tv_state_dict
    from vfs_tpu.apis.train import (_load_backbone_pretrained,
                                    create_train_state)
    from vfs_tpu.utils import Config

    sd50 = _fabricated_tv_state_dict(50)
    pth50 = str(tmp_path / 'r50.pth')
    torch.save(sd50, pth50)

    model = build_model(MODEL_CFG, train_cfg=dict(intra_video=False))
    tx = optax.sgd(0.1)
    sample = {'imgs': np.zeros((1, 2, 2, 32, 32, 3), np.float32)}
    state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    log = logging.getLogger('t')

    # r50 checkpoint into an r18 model: clear error, not a broken tree
    cfg = Config(dict(model=dict(MODEL_CFG, backbone=dict(
        MODEL_CFG['backbone'], pretrained=pth50))))
    with pytest.raises(ValueError, match='does not match'):
        _load_backbone_pretrained(state, cfg, log)

    # non-ResNet backbone with pretrained: clear error
    cfg = Config(dict(model=dict(MODEL_CFG, backbone=dict(
        type='AlexNetV1', pretrained=pth50))))
    with pytest.raises(ValueError, match='only supported'):
        _load_backbone_pretrained(state, cfg, log)
