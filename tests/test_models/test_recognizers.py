"""Recognizer family: build-from-config + forward shapes (reference test
pattern: tests/test_models/test_recognizers.py — construct from dict cfg,
forward random tensors, assert shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfs_tpu.models import build_model


def _forward(model, imgs, labels=None, train=True, return_loss=True):
    variables = model.init(jax.random.PRNGKey(0), imgs, labels, train=False,
                           return_loss=False)
    if return_loss:
        out, _ = model.apply(variables, imgs, labels, train=train,
                             return_loss=True, mutable=['batch_stats'],
                             rngs={'dropout': jax.random.PRNGKey(1)})
    else:
        out = model.apply(variables, imgs, labels, train=False,
                          return_loss=False)
    return out


def test_tsn():
    model = build_model(
        dict(type='Recognizer2D',
             backbone=dict(type='ResNet', depth=18),
             cls_head=dict(type='TSNHead', num_classes=11, in_channels=512)),
        test_cfg=dict(average_clips=None))
    imgs = jnp.asarray(np.random.randn(2, 3, 32, 32, 3), jnp.float32)
    labels = jnp.asarray([1, 5])
    losses = _forward(model, imgs, labels)
    assert 'loss_cls' in losses and np.isfinite(float(losses['loss_cls']))
    score = _forward(model, imgs, return_loss=False)
    assert score.shape == (2, 11)


def test_tsm():
    model = build_model(
        dict(type='Recognizer2D',
             backbone=dict(type='ResNetTSM', depth=18, num_segments=4),
             cls_head=dict(type='TSMHead', num_classes=7, in_channels=512,
                           num_segments=4)),
        test_cfg=dict(average_clips='prob'))
    imgs = jnp.asarray(np.random.randn(2, 4, 32, 32, 3), jnp.float32)
    labels = jnp.asarray([0, 3])
    losses = _forward(model, imgs, labels)
    assert np.isfinite(float(losses['loss_cls']))


def test_i3d_resnet3d():
    model = build_model(
        dict(type='Recognizer3D',
             backbone=dict(type='ResNet3d', depth=18,
                           spatial_strides=(1, 2, 2, 2)),
             cls_head=dict(type='I3DHead', num_classes=5, in_channels=512)),
        test_cfg=dict(average_clips='score'))
    imgs = jnp.asarray(np.random.randn(1, 1, 8, 32, 32, 3), jnp.float32)
    labels = jnp.asarray([2])
    losses = _forward(model, imgs, labels)
    assert np.isfinite(float(losses['loss_cls']))
    score = _forward(model, imgs, return_loss=False)
    assert score.shape == (1, 5)


def test_slowonly():
    model = build_model(
        dict(type='Recognizer3D',
             backbone=dict(type='ResNet3dSlowOnly', depth=18),
             cls_head=dict(type='I3DHead', num_classes=4, in_channels=512)),
        test_cfg=dict(average_clips='score'))
    imgs = jnp.asarray(np.random.randn(1, 1, 4, 32, 32, 3), jnp.float32)
    losses = _forward(model, imgs, jnp.asarray([1]))
    assert np.isfinite(float(losses['loss_cls']))


def test_slowfast():
    model = build_model(
        dict(type='Recognizer3D',
             backbone=dict(
                 type='ResNet3dSlowFast', resample_rate=4, speed_ratio=4,
                 channel_ratio=8,
                 slow_pathway=dict(depth=18, lateral=True,
                                   conv1_kernel=(1, 7, 7),
                                   conv1_stride_t=1, pool1_stride_t=1,
                                   inflate=(0, 0, 1, 1)),
                 fast_pathway=dict(depth=18, lateral=False, base_channels=8,
                                   conv1_kernel=(5, 7, 7), conv1_stride_t=1,
                                   pool1_stride_t=1)),
             cls_head=dict(type='SlowFastHead', num_classes=6,
                           in_channels=576)),
        test_cfg=dict(average_clips='prob'))
    imgs = jnp.asarray(np.random.randn(1, 1, 8, 32, 32, 3), jnp.float32)
    losses = _forward(model, imgs, jnp.asarray([0]))
    assert np.isfinite(float(losses['loss_cls']))


def test_r2plus1d_and_csn_backbones():
    from vfs_tpu.models import build_backbone
    x = jnp.asarray(np.random.randn(1, 4, 32, 32, 3), jnp.float32)
    r21d = build_backbone(dict(type='ResNet2Plus1d', depth=18))
    v = r21d.init(jax.random.PRNGKey(0), x, train=False)
    out = r21d.apply(v, x, train=False)
    assert out.shape[-1] == 512
    csn = build_backbone(dict(type='ResNet3dCSN', depth=50,
                              bottleneck_mode='ir'))
    v = csn.init(jax.random.PRNGKey(0), x, train=False)
    out = csn.apply(v, x, train=False)
    assert out.shape[-1] == 2048


def test_alexnet_and_tsm_shift():
    from vfs_tpu.models import build_backbone
    from vfs_tpu.models.backbones import temporal_shift
    a = build_backbone(dict(type='AlexNetV1'))
    x = jnp.asarray(np.random.randn(1, 127, 127, 3), jnp.float32)
    v = a.init(jax.random.PRNGKey(0), x, train=False)
    out = a.apply(v, x, train=False)
    assert out.shape[-1] == 256
    # temporal shift semantics: channel fold moves by one step
    xs = jnp.asarray(np.arange(2 * 4 * 1 * 1 * 8).reshape(8, 1, 1, 8),
                     jnp.float32)
    sh = temporal_shift(xs, num_segments=4, shift_div=8)
    assert sh.shape == xs.shape
    x5 = np.asarray(xs).reshape(2, 4, 1, 1, 8)
    s5 = np.asarray(sh).reshape(2, 4, 1, 1, 8)
    np.testing.assert_array_equal(s5[:, :-1, ..., 0], x5[:, 1:, ..., 0])
    np.testing.assert_array_equal(s5[:, -1, ..., 0], 0)
