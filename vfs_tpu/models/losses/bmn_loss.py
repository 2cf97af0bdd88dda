"""BMN + binary logistic regression losses (functional JAX).

Reference: mmaction/models/losses/{bmn_loss,binary_logistic_regression_
loss}.py. The PEM regression loss's random hard-negative sampling takes an
explicit PRNG key (torch used global RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES


def binary_logistic_regression_loss(reg_score, label, threshold=0.5,
                                    ratio_range=(1.05, 21), eps=1e-5):
    label = label.reshape(-1)
    reg_score = reg_score.reshape(-1)
    pmask = (label > threshold).astype(jnp.float32)
    num_positive = jnp.maximum(jnp.sum(pmask), 1)
    num_entries = label.shape[0]
    ratio = jnp.clip(num_entries / num_positive, ratio_range[0],
                     ratio_range[1])
    coef_0 = 0.5 * ratio / (ratio - 1)
    coef_1 = 0.5 * ratio
    loss = coef_1 * pmask * jnp.log(reg_score + eps) + coef_0 * (
        1.0 - pmask) * jnp.log(1.0 - reg_score + eps)
    return -jnp.mean(loss)


@LOSSES.register_module()
class BinaryLogisticRegressionLoss:

    def __call__(self, reg_score, label, threshold=0.5,
                 ratio_range=(1.05, 21), eps=1e-5):
        return binary_logistic_regression_loss(reg_score, label, threshold,
                                               ratio_range, eps)


@LOSSES.register_module()
class BMNLoss:
    """Weighted sum of TEM loss, PEM regression and classification losses
    (reference bmn_loss.py:10-180)."""

    @staticmethod
    def tem_loss(pred_start, pred_end, gt_start, gt_end):
        return (binary_logistic_regression_loss(pred_start, gt_start) +
                binary_logistic_regression_loss(pred_end, gt_end))

    @staticmethod
    def pem_reg_loss(pred_score, gt_iou_map, mask, rng,
                     high_temporal_iou_threshold=0.7,
                     low_temporal_iou_threshold=0.3):
        u_hmask = (gt_iou_map > high_temporal_iou_threshold).astype(
            jnp.float32)
        u_mmask = ((gt_iou_map <= high_temporal_iou_threshold) &
                   (gt_iou_map > low_temporal_iou_threshold)).astype(
                       jnp.float32)
        u_lmask = ((gt_iou_map <= low_temporal_iou_threshold) &
                   (gt_iou_map > 0.0)).astype(jnp.float32) * mask
        num_h = jnp.sum(u_hmask)
        num_m = jnp.sum(u_mmask)
        num_l = jnp.sum(u_lmask)
        r_m = num_h / jnp.maximum(num_m, 1)
        rng_m, rng_l = jax.random.split(rng)
        u_smmask = u_mmask * jax.random.uniform(rng_m, gt_iou_map.shape)
        u_smmask = (u_smmask > (1.0 - r_m)).astype(jnp.float32)
        r_l = num_h / jnp.maximum(num_l, 1)
        u_slmask = u_lmask * jax.random.uniform(rng_l, gt_iou_map.shape)
        u_slmask = (u_slmask > (1.0 - r_l)).astype(jnp.float32)
        weights = u_hmask + u_smmask + u_slmask
        mse = (pred_score * weights - gt_iou_map * weights)**2
        return 0.5 * jnp.sum(mse) / jnp.maximum(jnp.sum(weights), 1)

    @staticmethod
    def pem_cls_loss(pred_score, gt_iou_map, mask, threshold=0.9,
                     ratio_range=(1.05, 21), eps=1e-5):
        pmask = (gt_iou_map > threshold).astype(jnp.float32)
        nmask = (gt_iou_map <= threshold).astype(jnp.float32) * mask
        num_positive = jnp.maximum(jnp.sum(pmask), 1)
        num_entries = num_positive + jnp.sum(nmask)
        ratio = jnp.clip(num_entries / num_positive, ratio_range[0],
                         ratio_range[1])
        coef_0 = 0.5 * ratio / (ratio - 1)
        coef_1 = 0.5 * ratio
        loss_pos = coef_1 * jnp.log(pred_score + eps) * pmask
        loss_neg = coef_0 * jnp.log(1.0 - pred_score + eps) * nmask
        return -jnp.sum(loss_pos + loss_neg) / num_entries

    def __call__(self, pred_bm, pred_start, pred_end, gt_iou_map, gt_start,
                 gt_end, bm_mask, rng=None, weight_tem=1.0,
                 weight_pem_reg=10.0, weight_pem_cls=1.0):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        pred_bm_reg = pred_bm[:, ..., 0]
        pred_bm_cls = pred_bm[:, ..., 1]
        gt_iou_map = gt_iou_map * bm_mask
        pem_reg_loss = self.pem_reg_loss(pred_bm_reg, gt_iou_map, bm_mask,
                                         rng)
        pem_cls_loss = self.pem_cls_loss(pred_bm_cls, gt_iou_map, bm_mask)
        tem_loss = self.tem_loss(pred_start, pred_end, gt_start, gt_end)
        loss = (weight_tem * tem_loss + weight_pem_reg * pem_reg_loss +
                weight_pem_cls * pem_cls_loss)
        return loss, tem_loss, pem_reg_loss, pem_cls_loss
