"""SimSiam frame-level similarity pretraining model (Flax linen).

Reference: mmaction/models/trackers/sim_siam_base_tracker.py:8-76. The
``intra_video`` mode rolls the second view's (z, p) temporally within the
clip and adds a loss term per shift — the "frame-level similarity" core idea
(reference :44-55). In JAX the rolls are static-shape ``jnp.roll`` over the
clip axis inside one jitted loss.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ...utils import add_prefix
from .. import builder
from ..registry import TRACKERS


@TRACKERS.register_module()
class SimSiamBaseTracker(nn.Module):
    backbone: Any
    img_head: Any = None
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None

    def setup(self):
        self._backbone = builder.build_backbone(dict(self.backbone))
        self._img_head = (builder.build_head(dict(self.img_head))
                          if self.img_head is not None else None)
        tc = dict(self.train_cfg or {})
        self.intra_video = bool(tc.get('intra_video', False))
        self.transpose_temporal = bool(tc.get('transpose_temporal', False))

    def forward_img_head(self, x1, x2, clip_len: int,
                         train: bool = True) -> Dict:
        if isinstance(x1, tuple):
            x1 = x1[-1]
        if isinstance(x2, tuple):
            x2 = x2[-1]
        losses = {}
        z1, p1 = self._img_head(x1, train=train)
        z2, p2 = self._img_head(x2, train=train)
        loss_weight = 1.0 / clip_len if self.intra_video else 1.0
        losses.update(add_prefix(
            self._img_head.loss(p1, z1, p2, z2, weight=loss_weight),
            prefix='0'))
        if self.intra_video:
            # (B*T, C) -> (B, T, C) for temporal rolls
            bt, c = z2.shape
            z2_v = z2.reshape(bt // clip_len, clip_len, c)
            p2_v = p2.reshape(bt // clip_len, clip_len, c)
            for i in range(1, clip_len):
                z2_r = jnp.roll(z2_v, i, axis=1).reshape(bt, c)
                p2_r = jnp.roll(p2_v, i, axis=1).reshape(bt, c)
                losses.update(add_prefix(
                    self._img_head.loss(p1, z1, p2_r, z2_r,
                                        weight=loss_weight),
                    prefix=f'{i}'))
        return losses

    def __call__(self, imgs: jnp.ndarray, train: bool = True) -> Dict:
        """imgs: (B, 2, T, H, W, C) two augmented clips -> loss dict
        (reference forward_train, sim_siam_base_tracker.py:58-76)."""
        assert imgs.ndim == 6 and imgs.shape[1] == 2
        b, _, t, h, w, c = imgs.shape
        imgs1 = imgs[:, 0].reshape(b * t, h, w, c)
        imgs2 = imgs[:, 1].reshape(b * t, h, w, c)
        x1 = self._backbone(imgs1, train=train)
        x2 = self._backbone(imgs2, train=train)
        losses = {}
        if self._img_head is not None:
            losses.update(add_prefix(
                self.forward_img_head(x1, x2, t, train=train),
                prefix='img_head'))
        return losses


def parse_losses(losses: Dict) -> tuple:
    """(total_loss, log_vars) — sums every entry whose key contains 'loss'
    after per-entry mean (reference trackers/base.py:76-110). The cross-host
    log-var mean happens outside jit via process_allgather when needed."""
    log_vars = {}
    for name, value in losses.items():
        log_vars[name] = jnp.mean(value)
    total = sum(v for k, v in log_vars.items() if 'loss' in k)
    log_vars['loss'] = total
    return total, log_vars
