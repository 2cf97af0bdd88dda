"""Similarity losses (reference: mmaction/models/losses/sim_loss.py:8-63).

Functional, channels-last. ``loss_weight`` mirrors BaseWeightedLoss
(reference losses/base.py:6-37)."""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.affinity import l2_normalize
from ..registry import LOSSES


@LOSSES.register_module()
class CosineSimLoss:
    """``2 - 2*cos(p, z)`` (or ``-cos`` when negative=True) over
    feature-normalized inputs; optional pairwise spatial mode with mask.

    Inputs are channels-last: ``(N, C)`` pooled features or ``(N, H, W, C)``
    maps (pairwise mode).
    """

    def __init__(self, with_norm=True, negative=False, pairwise=False,
                 loss_weight=1.0):
        self.with_norm = with_norm
        self.negative = negative
        self.pairwise = pairwise
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label, mask=None):
        if self.with_norm:
            cls_score = l2_normalize(cls_score, axis=-1)
            label = l2_normalize(label, axis=-1)
        if mask is not None:
            assert self.pairwise
        if self.pairwise:
            n = cls_score.shape[0]
            s = cls_score.reshape(n, -1, cls_score.shape[-1])
            t = label.reshape(n, -1, label.shape[-1])
            prod = jnp.einsum('nic,njc->nij', s, t,
                              preferred_element_type=jnp.float32)
            if mask is not None:
                prod = prod * mask.astype(prod.dtype)
            prod = prod.reshape(n, -1)
        else:
            prod = jnp.sum(cls_score * label, axis=-1).reshape(
                cls_score.shape[0], -1)
        if self.negative:
            loss = -jnp.mean(prod, axis=-1)
        else:
            loss = 2 - 2 * jnp.mean(prod, axis=-1)
        return loss * self.loss_weight


@LOSSES.register_module()
class DotSimLoss:
    """Negative dot-product similarity (reference sim_loss.py:8-22)."""

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label):
        n = cls_score.shape[0]
        s = cls_score.reshape(n, -1, cls_score.shape[-1])
        t = label.reshape(n, -1, label.shape[-1])
        prod = jnp.einsum('nic,njc->nij', s, t,
                          preferred_element_type=jnp.float32)
        return -jnp.mean(prod) * self.loss_weight
