"""SSN temporal action detector (Flax).

Reference: mmaction/models/localizers/ssn.py:10-129. Train path is fully
jitted (backbone -> pool -> SSNHead(STPPTrain) -> SSNLoss); the test-time
variable-tick STPP decode runs host-side via
``vfs_tpu.models.heads.ssn_head.STPPTest``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .. import builder
from ..registry import LOCALIZERS


@LOCALIZERS.register_module()
class SSN(nn.Module):
    backbone: Any
    cls_head: Any
    in_channels: int = 3
    spatial_type: str = 'avg'
    dropout_ratio: float = 0.5
    loss_cls: Any = None
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None

    def setup(self):
        self._backbone = builder.build_backbone(dict(self.backbone))
        self._cls_head = builder.build_head(dict(self.cls_head))
        self._loss_cls = builder.build_loss(
            dict(self.loss_cls or dict(type='SSNLoss')))

    def extract_feat(self, imgs, train):
        x = self._backbone(imgs, train=train)
        if isinstance(x, tuple):
            x = x[-1]
        # global spatial pool (reference pools 7x7 -> 1)
        if self.spatial_type == 'avg':
            x = jnp.mean(x, axis=(1, 2))
        elif self.spatial_type == 'max':
            x = jnp.max(x, axis=(1, 2))
        return x

    def __call__(self, imgs, proposal_scale_factor=None, proposal_type=None,
                 proposal_labels=None, reg_targets=None, train: bool = True,
                 return_loss: bool = True):
        """Train: imgs (N, num_proposals, num_segments, H, W, C) ->
        loss dict. Test: returns pooled per-segment features for the
        host-side STPPTest decode."""
        imgs = imgs.reshape((-1,) + imgs.shape[-3:])
        x = self.extract_feat(imgs, train)
        if not return_loss:
            return x
        activity_scores, completeness_scores, bbox_preds = self._cls_head(
            x, proposal_scale_factor, train=train)
        return self._loss_cls(activity_scores, completeness_scores,
                              bbox_preds, proposal_type, proposal_labels,
                              reg_targets, self.train_cfg)
