"""SimSiam projection/prediction head (Flax linen).

Reference: mmaction/models/heads/sim_siam_head.py:14-174. Projection MLP =
``num_projection_fcs`` x [Linear, BN] with ReLU between (no ReLU after the
last, but BN yes); predictor MLP = ``num_predictor_fcs`` x [Linear(+BN+ReLU
except last)]. Global average pool first (spatial_type='avg').

SyncBN note: under pjit with the batch sharded over the mesh, flax
BatchNorm's batch statistics are computed over the *global* batch by XLA
(GSPMD inserts the collectives) — the reference's SyncBN is free, no
axis_name wiring needed for the pjit path.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..builder import build_loss
from ..registry import HEADS


class MLPBlock(nn.Module):
    features: int
    with_bn: bool = True
    with_relu: bool = True
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        x = nn.Dense(self.features, name='fc')(x)
        if self.with_bn:
            x = nn.BatchNorm(use_running_average=use_running_average,
                             momentum=0.9, epsilon=1e-5,
                             axis_name=self.sync_axis
                             if not use_running_average else None,
                             name='bn')(x)
        if self.with_relu:
            x = nn.relu(x)
        return x


@HEADS.register_module()
class SimSiamHead(nn.Module):
    in_channels: int
    num_projection_fcs: int = 3
    projection_mid_channels: int = 2048
    projection_out_channels: int = 2048
    num_predictor_fcs: int = 2
    predictor_mid_channels: int = 512
    predictor_out_channels: int = 2048
    with_norm: bool = True
    loss_feat: Any = None
    spatial_type: str = 'avg'
    num_convs: int = 0
    conv_mid_channels: int = 2048
    conv_out_channles: int = 2048
    kernel_size: int = 1
    norm_cfg: Any = None  # config-compat, unused (BN always)
    sync_axis: Optional[str] = None

    def setup(self):
        loss_cfg = self.loss_feat or dict(type='CosineSimLoss',
                                          negative=False)
        self._loss_feat = build_loss(dict(loss_cfg))

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (N, H, W, C) feature map -> (z, p) each (N, out_channels)."""
        ura = not train
        for i in range(self.num_convs):
            is_last = i == self.num_convs - 1
            feats = self.conv_out_channles if is_last \
                else self.conv_mid_channels
            x = nn.Conv(feats, (self.kernel_size, self.kernel_size),
                        padding='SAME', use_bias=False,
                        name=f'conv{i}')(x)
            if not is_last:
                x = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                                 epsilon=1e-5, name=f'conv_bn{i}')(x)
                x = nn.relu(x)
        if self.spatial_type == 'avg' and x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        z = x
        for i in range(self.num_projection_fcs):
            is_last = i == self.num_projection_fcs - 1
            feats = self.projection_out_channels if is_last \
                else self.projection_mid_channels
            # BN on every projection fc incl. the last; no ReLU on last
            z = MLPBlock(feats, with_bn=True, with_relu=not is_last,
                         sync_axis=self.sync_axis,
                         name=f'projection_fc{i}')(z, ura)
        p = z
        for i in range(self.num_predictor_fcs):
            is_last = i == self.num_predictor_fcs - 1
            feats = self.predictor_out_channels if is_last \
                else self.predictor_mid_channels
            p = MLPBlock(feats, with_bn=not is_last,
                         with_relu=not is_last,
                         sync_axis=self.sync_axis,
                         name=f'predictor_fc{i}')(p, ura)
        return z, p

    def loss(self, p1, z1, p2, z2, weight=1.0):
        """Symmetric stop-gradient SimSiam loss (reference
        sim_siam_head.py:165-174)."""
        import jax
        loss_feat = (self._loss_feat(p1, jax.lax.stop_gradient(z2)) * 0.5 +
                     self._loss_feat(p2, jax.lax.stop_gradient(z1)) * 0.5)
        return {'loss_feat': loss_feat * weight}


@HEADS.register_module()
class DenseSimSiamHead(nn.Module):
    """Dense (per-pixel conv) SimSiam variant — registered but unused by
    the shipped configs (reference sim_siam_head.py:177-284)."""
    in_channels: int
    kernel_size: int = 1
    num_projection_convs: int = 3
    projection_mid_channels: int = 2048
    projection_out_channels: int = 2048
    num_predictor_convs: int = 2
    predictor_mid_channels: int = 512
    predictor_out_channels: int = 2048
    loss_feat: Any = None
    norm_cfg: Any = None
    sync_axis: Optional[str] = None

    def setup(self):
        loss_cfg = self.loss_feat or dict(type='CosineSimLoss',
                                          negative=False, pairwise=True)
        self._loss_feat = build_loss(dict(loss_cfg))

    @nn.compact
    def __call__(self, x, train: bool = True):
        ura = not train
        k = (self.kernel_size, self.kernel_size)
        z = x
        for i in range(self.num_projection_convs):
            is_last = i == self.num_projection_convs - 1
            feats = self.projection_out_channels if is_last \
                else self.projection_mid_channels
            z = nn.Conv(feats, k, padding='SAME', use_bias=False,
                        name=f'projection_conv{i}')(z)
            z = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                             epsilon=1e-5, name=f'projection_bn{i}')(z)
            if not is_last:
                z = nn.relu(z)
        p = z
        for i in range(self.num_predictor_convs):
            is_last = i == self.num_predictor_convs - 1
            feats = self.predictor_out_channels if is_last \
                else self.predictor_mid_channels
            p = nn.Conv(feats, k, padding='SAME', use_bias=False,
                        name=f'predictor_conv{i}')(p)
            if not is_last:
                p = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                                 epsilon=1e-5, name=f'predictor_bn{i}')(p)
                p = nn.relu(p)
        return z, p

    def loss(self, p1, z1, p2, z2, mask12=None, mask21=None, weight=1.0):
        import jax
        loss_feat = (
            self._loss_feat(p1, jax.lax.stop_gradient(z2), mask12) * 0.5 +
            self._loss_feat(p2, jax.lax.stop_gradient(z1), mask21) * 0.5)
        return {'loss_feat': loss_feat * weight}
