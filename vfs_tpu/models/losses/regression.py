"""Misc losses (reference: mmaction/models/losses/{cross_entropy_loss,
nll_loss,hvu_loss}.py + smooth_l1 etc. — the §2.2 compatibility set)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES


@LOSSES.register_module()
class CrossEntropyLoss:

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label):
        if label.ndim == cls_score.ndim:  # soft labels
            lsm = jax.nn.log_softmax(cls_score, axis=-1)
            loss = -jnp.sum(label * lsm, axis=-1).mean()
        else:
            lsm = jax.nn.log_softmax(cls_score, axis=-1)
            loss = -jnp.take_along_axis(
                lsm, label[..., None], axis=-1).mean()
        return loss * self.loss_weight


@LOSSES.register_module()
class BCELossWithLogits:

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label):
        log_p = jax.nn.log_sigmoid(cls_score)
        log_not_p = jax.nn.log_sigmoid(-cls_score)
        loss = -(label * log_p + (1 - label) * log_not_p).mean()
        return loss * self.loss_weight


@LOSSES.register_module()
class NLLLoss:

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label):
        loss = -jnp.take_along_axis(cls_score, label[..., None],
                                    axis=-1).mean()
        return loss * self.loss_weight


@LOSSES.register_module()
class MSELoss:

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target):
        return jnp.mean((pred - target)**2) * self.loss_weight


@LOSSES.register_module()
class L1Loss:

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target):
        return jnp.mean(jnp.abs(pred - target)) * self.loss_weight


@LOSSES.register_module()
class SmoothL1Loss:

    def __init__(self, beta=1.0, loss_weight=1.0):
        self.beta = beta
        self.loss_weight = loss_weight

    def __call__(self, pred, target):
        diff = jnp.abs(pred - target)
        loss = jnp.where(diff < self.beta, 0.5 * diff**2 / self.beta,
                         diff - 0.5 * self.beta)
        return jnp.mean(loss) * self.loss_weight
