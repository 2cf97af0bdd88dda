"""Recognition heads (Flax), the §2.2 compatibility family.

Reference: mmaction/models/heads/{base,tsn_head,i3d_head,tsm_head,
slowfast_head}.py. Channels-last feature maps in; class scores out.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import build_loss
from ..registry import HEADS


def head_loss(loss_cls, cls_score, labels, num_classes,
              label_smooth_eps=0.0, multi_class=False):
    """BaseHead.loss semantics (reference heads/base.py:70-101)."""
    if not multi_class and labels.ndim == cls_score.ndim:
        pass  # already soft/one-hot
    elif multi_class and label_smooth_eps:
        labels = ((1 - label_smooth_eps) * labels +
                  label_smooth_eps / num_classes)
    return {'loss_cls': loss_cls(cls_score, labels)}


@HEADS.register_module()
class TSNHead(nn.Module):
    """TSN: spatial avg pool + segment consensus + fc (reference
    tsn_head.py:9-96)."""
    num_classes: int
    in_channels: int
    loss_cls: Any = None
    spatial_type: str = 'avg'
    consensus: Any = None
    dropout_ratio: float = 0.4
    init_std: float = 0.01
    multi_class: bool = False
    label_smooth_eps: float = 0.0

    def setup(self):
        self._loss_cls = build_loss(
            dict(self.loss_cls or dict(type='CrossEntropyLoss')))

    @nn.compact
    def __call__(self, x, num_segs: int, train: bool = False):
        # x: (N*num_segs, H, W, C)
        if self.spatial_type == 'avg':
            x = jnp.mean(x, axis=(1, 2))  # (N*segs, C)
        x = x.reshape(-1, num_segs, x.shape[-1])
        x = jnp.mean(x, axis=1)  # AvgConsensus over segments
        if self.dropout_ratio and train:
            x = nn.Dropout(self.dropout_ratio, deterministic=False)(x)
        cls_score = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(self.init_std),
            name='fc_cls')(x)
        return cls_score

    def loss(self, cls_score, labels):
        return head_loss(self._loss_cls, cls_score, labels,
                         self.num_classes, self.label_smooth_eps,
                         self.multi_class)


@HEADS.register_module()
class I3DHead(nn.Module):
    """I3D: 3D global avg pool + fc (reference i3d_head.py:9-85)."""
    num_classes: int
    in_channels: int
    loss_cls: Any = None
    spatial_type: str = 'avg'
    dropout_ratio: float = 0.5
    init_std: float = 0.01
    multi_class: bool = False
    label_smooth_eps: float = 0.0

    def setup(self):
        self._loss_cls = build_loss(
            dict(self.loss_cls or dict(type='CrossEntropyLoss')))

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, T, H, W, C)
        if self.spatial_type == 'avg':
            x = jnp.mean(x, axis=(1, 2, 3))
        if self.dropout_ratio and train:
            x = nn.Dropout(self.dropout_ratio, deterministic=False)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        name='fc_cls')(x)

    def loss(self, cls_score, labels):
        return head_loss(self._loss_cls, cls_score, labels,
                         self.num_classes, self.label_smooth_eps,
                         self.multi_class)


@HEADS.register_module()
class TSMHead(nn.Module):
    """TSM: fc before consensus, averaged after (reference tsm_head.py)."""
    num_classes: int
    in_channels: int
    num_segments: int = 8
    loss_cls: Any = None
    spatial_type: str = 'avg'
    consensus: Any = None
    dropout_ratio: float = 0.8
    init_std: float = 0.001
    is_shift: bool = True
    temporal_pool: bool = False
    multi_class: bool = False
    label_smooth_eps: float = 0.0

    def setup(self):
        self._loss_cls = build_loss(
            dict(self.loss_cls or dict(type='CrossEntropyLoss')))

    @nn.compact
    def __call__(self, x, num_segs: Optional[int] = None,
                 train: bool = False):
        if self.spatial_type == 'avg' and x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        if self.dropout_ratio and train:
            x = nn.Dropout(self.dropout_ratio, deterministic=False)(x)
        cls_score = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(self.init_std),
            name='fc_cls')(x)
        segs = self.num_segments if not self.temporal_pool \
            else self.num_segments // 2
        cls_score = cls_score.reshape(-1, segs, self.num_classes)
        return jnp.mean(cls_score, axis=1)

    def loss(self, cls_score, labels):
        return head_loss(self._loss_cls, cls_score, labels,
                         self.num_classes, self.label_smooth_eps,
                         self.multi_class)


@HEADS.register_module()
class SlowFastHead(nn.Module):
    """SlowFast: concat pooled slow+fast pathways + fc (reference
    slowfast_head.py)."""
    num_classes: int
    in_channels: int
    loss_cls: Any = None
    spatial_type: str = 'avg'
    dropout_ratio: float = 0.8
    init_std: float = 0.01
    multi_class: bool = False
    label_smooth_eps: float = 0.0

    def setup(self):
        self._loss_cls = build_loss(
            dict(self.loss_cls or dict(type='CrossEntropyLoss')))

    @nn.compact
    def __call__(self, x: Tuple[jnp.ndarray, jnp.ndarray],
                 train: bool = False):
        x_slow, x_fast = x  # each (N, T, H, W, C)
        x_slow = jnp.mean(x_slow, axis=(1, 2, 3))
        x_fast = jnp.mean(x_fast, axis=(1, 2, 3))
        # fc layout parity: the reference head unpacks its input tuple
        # as (fast, slow) and concatenates (slow_var, fast_var) — i.e.
        # element 1 THEN element 0 (slowfast_head.py:64-69). With the
        # backbone emitting (slow, fast), the fc sees [fast, slow].
        feat = jnp.concatenate([x_fast, x_slow], axis=-1)
        if self.dropout_ratio and train:
            feat = nn.Dropout(self.dropout_ratio, deterministic=False)(feat)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        name='fc_cls')(feat)

    def loss(self, cls_score, labels):
        return head_loss(self._loss_cls, cls_score, labels,
                         self.num_classes, self.label_smooth_eps,
                         self.multi_class)
