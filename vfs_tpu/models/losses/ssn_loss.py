"""SSN losses: OHEM hinge + activity/completeness/regression composition.

Reference: mmaction/models/losses/{ohem_hinge_loss,ssn_loss}.py. The OHEM
hinge is a custom-VJP op (the torch original subclasses autograd.Function):
only the kept hard examples receive gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES


@jax.custom_vjp
def ohem_hinge_loss(pred, labels, is_positive, ohem_ratio, group_size):
    return _ohem_forward(pred, labels, is_positive, ohem_ratio,
                         group_size)[0]


def _ohem_forward(pred, labels, is_positive, ohem_ratio, group_size):
    num_samples = pred.shape[0]
    class_pred = jnp.take_along_axis(pred, (labels - 1)[:, None],
                                     axis=1)[:, 0]
    losses = jnp.maximum(0.0, 1.0 - is_positive * class_pred)
    slopes = jnp.where(losses != 0, -float(is_positive), 0.0)
    grouped = losses.reshape(-1, group_size)
    keep_length = int(group_size * ohem_ratio)
    sorted_losses = -jnp.sort(-grouped, axis=1)
    sort_idx = jnp.argsort(-grouped, axis=1)
    loss = sorted_losses[:, :keep_length].sum()
    keep_idx = sort_idx[:, :keep_length]
    return loss, (slopes, keep_idx, labels, pred.shape, group_size)


def _ohem_fwd(pred, labels, is_positive, ohem_ratio, group_size):
    loss, res = _ohem_forward(pred, labels, is_positive, ohem_ratio,
                              group_size)
    return loss, res


def _ohem_bwd(res, g):
    slopes, keep_idx, labels, pred_shape, group_size = res
    num_groups, keep_len = keep_idx.shape
    grad = jnp.zeros(pred_shape, jnp.float32)
    # rows kept by OHEM get gradient on their label column
    group_ids = jnp.repeat(jnp.arange(num_groups), keep_len)
    rows = group_ids * group_size + keep_idx.reshape(-1)
    cols = labels[rows] - 1
    vals = slopes[rows] * g / float(num_groups * keep_len)
    grad = grad.at[rows, cols].add(vals)
    return grad, None, None, None, None


ohem_hinge_loss.defvjp(_ohem_fwd, _ohem_bwd)


@LOSSES.register_module()
class OHEMHingeLoss:
    """Functional wrapper (reference ohem_hinge_loss.py:4-80)."""

    def __call__(self, pred, labels, is_positive, ohem_ratio, group_size):
        return ohem_hinge_loss(pred, labels, is_positive, ohem_ratio,
                               group_size)


@LOSSES.register_module()
class SSNLoss:
    """Activity CE + OHEM completeness + class-wise smooth-L1 regression
    (reference ssn_loss.py:10-186)."""

    @staticmethod
    def activity_loss(activity_score, labels, activity_indexer):
        sel_score = activity_score[activity_indexer]
        sel_labels = labels[activity_indexer]
        lsm = jax.nn.log_softmax(sel_score, axis=-1)
        return -jnp.take_along_axis(lsm, sel_labels[:, None],
                                    axis=1).mean()

    @staticmethod
    def completeness_loss(completeness_score, labels, completeness_indexer,
                          positive_per_video, incomplete_per_video,
                          ohem_ratio):
        pred = completeness_score[completeness_indexer]
        gt = labels[completeness_indexer]
        pred_dim = pred.shape[1]
        pred = pred.reshape(-1, positive_per_video + incomplete_per_video,
                            pred_dim)
        gt = gt.reshape(-1, positive_per_video + incomplete_per_video)
        pos_pred = pred[:, :positive_per_video].reshape(-1, pred_dim)
        pos_gt = gt[:, :positive_per_video].reshape(-1)
        inc_pred = pred[:, positive_per_video:].reshape(-1, pred_dim)
        inc_gt = gt[:, positive_per_video:].reshape(-1)
        pos_loss = ohem_hinge_loss(pos_pred, pos_gt, 1, 1.0,
                                   positive_per_video)
        inc_loss = ohem_hinge_loss(inc_pred, inc_gt, -1, ohem_ratio,
                                   incomplete_per_video)
        num_pos = pos_pred.shape[0]
        num_inc = int(inc_pred.shape[0] * ohem_ratio)
        return (pos_loss + inc_loss) / float(max(num_pos + num_inc, 1))

    @staticmethod
    def classwise_regression_loss(bbox_pred, labels, bbox_targets,
                                  regression_indexer):
        pred = bbox_pred[regression_indexer]
        gt = labels[regression_indexer]
        reg_target = bbox_targets[regression_indexer]
        class_idx = gt - 1
        classwise_pred = pred[jnp.arange(pred.shape[0]), class_idx]
        diff = jnp.abs(classwise_pred - reg_target)
        loss = jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
        return loss.sum(axis=-1).mean()

    def __call__(self, activity_score, completeness_score, bbox_pred,
                 proposal_type, labels, bbox_targets, train_cfg):
        sampler = train_cfg['ssn']['sampler']
        loss_weight = train_cfg['ssn']['loss_weight']
        proposal_type = proposal_type.reshape(-1)
        labels = labels.reshape(-1)
        total_ratio = (sampler['positive_ratio'] +
                       sampler['background_ratio'] +
                       sampler['incomplete_ratio'])
        positive_per_video = int(sampler['num_per_video'] *
                                 (sampler['positive_ratio'] / total_ratio))
        background_per_video = int(
            sampler['num_per_video'] *
            (sampler['background_ratio'] / total_ratio))
        incomplete_per_video = (sampler['num_per_video'] -
                                positive_per_video - background_per_video)
        # the SSN sampler emits a fixed per-video layout (positives,
        # incompletes, backgrounds — ssn_dataset.py:_video_centric_sampling)
        # so the indexer sizes are static and the loss stays jittable
        num_videos = proposal_type.shape[0] // sampler['num_per_video']
        activity_indexer = jnp.nonzero(
            (proposal_type == 0) | (proposal_type == 2),
            size=num_videos * (positive_per_video + background_per_video))[0]
        completeness_indexer = jnp.nonzero(
            (proposal_type == 0) | (proposal_type == 1),
            size=num_videos * (positive_per_video +
                               incomplete_per_video))[0]
        losses = {}
        losses['loss_activity'] = self.activity_loss(
            activity_score, labels, activity_indexer)
        losses['loss_completeness'] = self.completeness_loss(
            completeness_score, labels, completeness_indexer,
            positive_per_video, incomplete_per_video,
            ohem_ratio=positive_per_video / incomplete_per_video) * \
            loss_weight['comp_loss_weight']
        if bbox_pred is not None:
            regression_indexer = jnp.nonzero(
                proposal_type == 0, size=num_videos * positive_per_video)[0]
            bbox_targets = bbox_targets.reshape(-1, 2)
            losses['loss_reg'] = self.classwise_regression_loss(
                bbox_pred, labels, bbox_targets, regression_indexer) * \
                loss_weight['reg_loss_weight']
        return losses
