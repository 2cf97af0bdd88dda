"""BSN Temporal/Proposal Evaluation Models (Flax).

Reference: mmaction/models/localizers/bsn.py:14-430 (TEM, PEM)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...localization import temporal_iop
from ..builder import build_loss
from ..registry import LOCALIZERS


@LOCALIZERS.register_module()
class TEM(nn.Module):
    """Temporal Evaluation Model: 3 conv1d layers -> sigmoid (action,
    start, end) scores per position."""
    temporal_dim: int
    boundary_ratio: float
    tem_feat_dim: int
    tem_hidden_dim: int
    tem_match_threshold: float
    loss_cls: Any = None
    loss_weight: float = 2.0
    output_dim: int = 3
    conv1_ratio: float = 1.0
    conv2_ratio: float = 1.0
    conv3_ratio: float = 0.01
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None

    def setup(self):
        self._loss = build_loss(dict(
            self.loss_cls or dict(type='BinaryLogisticRegressionLoss')))

    @nn.compact
    def __call__(self, raw_feature, train: bool = True):
        """raw_feature (N, T, feat_dim) -> (N, T, 3) sigmoid scores."""
        x = nn.relu(self.conv1_ratio * nn.Conv(
            self.tem_hidden_dim, (3,), padding=[(1, 1)],
            name='conv1')(raw_feature))
        x = nn.relu(self.conv2_ratio * nn.Conv(
            self.tem_hidden_dim, (3,), padding=[(1, 1)], name='conv2')(x))
        x = jax.nn.sigmoid(self.conv3_ratio * nn.Conv(
            self.output_dim, (1,), padding='VALID', name='conv3')(x))
        return x

    def loss(self, tem_output, label_action, label_start, label_end):
        """Weighted BLR losses on action/start/end (reference :120-140)."""
        score_action = tem_output[..., 0]
        score_start = tem_output[..., 1]
        score_end = tem_output[..., 2]
        loss_action = self._loss(score_action, label_action,
                                 self.tem_match_threshold)
        loss_start = self._loss(score_start, label_start,
                                self.tem_match_threshold)
        loss_end = self._loss(score_end, label_end,
                              self.tem_match_threshold)
        return dict(
            loss_action=loss_action * self.loss_weight,
            loss_start=loss_start,
            loss_end=loss_end)

    def generate_labels(self, gt_bbox):
        """Anchor-overlap labels (reference bsn.py:162-226)."""
        tscale = self.temporal_dim
        gap = 1.0 / tscale
        anchors_tmins = np.array([gap * i for i in range(tscale)])
        anchors_tmaxs = anchors_tmins + gap
        match_score_action_list = []
        match_score_start_list = []
        match_score_end_list = []
        for every_gt_bbox in gt_bbox:
            every_gt_bbox = np.asarray(every_gt_bbox)
            gt_tmins = every_gt_bbox[:, 0]
            gt_tmaxs = every_gt_bbox[:, 1]
            gt_lens = gt_tmaxs - gt_tmins
            gt_len_pad = np.maximum(gap, self.boundary_ratio * gt_lens)
            gt_start_bboxs = np.stack(
                (gt_tmins - gt_len_pad / 2, gt_tmins + gt_len_pad / 2),
                axis=1)
            gt_end_bboxs = np.stack(
                (gt_tmaxs - gt_len_pad / 2, gt_tmaxs + gt_len_pad / 2),
                axis=1)
            ms_action, ms_start, ms_end = [], [], []
            for tmin, tmax in zip(anchors_tmins, anchors_tmaxs):
                ms_action.append(np.max(
                    temporal_iop(tmin, tmax, gt_tmins, gt_tmaxs)))
                ms_start.append(np.max(temporal_iop(
                    tmin, tmax, gt_start_bboxs[:, 0], gt_start_bboxs[:, 1])))
                ms_end.append(np.max(temporal_iop(
                    tmin, tmax, gt_end_bboxs[:, 0], gt_end_bboxs[:, 1])))
            match_score_action_list.append(ms_action)
            match_score_start_list.append(ms_start)
            match_score_end_list.append(ms_end)
        return (np.array(match_score_action_list, np.float32),
                np.array(match_score_start_list, np.float32),
                np.array(match_score_end_list, np.float32))


@LOCALIZERS.register_module()
class PEM(nn.Module):
    """Proposal Evaluation Model: 2 fcs scoring BSP features."""
    pem_feat_dim: int
    pem_hidden_dim: int
    pem_u_ratio_m: float
    pem_u_ratio_l: float
    pem_high_temporal_iou_threshold: float
    pem_low_temporal_iou_threshold: float
    soft_nms_alpha: float
    soft_nms_low_threshold: float
    soft_nms_high_threshold: float
    post_process_top_k: int
    fc1_ratio: float = 0.1
    fc2_ratio: float = 0.1
    output_dim: int = 1
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None

    @nn.compact
    def __call__(self, bsp_feature, train: bool = True):
        """bsp_feature (M, feat_dim) -> (M, output_dim) sigmoid scores."""
        x = nn.relu(self.fc1_ratio * nn.Dense(
            self.pem_hidden_dim, name='fc1')(bsp_feature))
        return jax.nn.sigmoid(self.fc2_ratio * nn.Dense(
            self.output_dim, name='fc2')(x))

    def loss(self, pem_output, reference_temporal_iou, rng=None):
        """Hard-sample-balanced MSE (reference bsn.py:305-348)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        pred = pem_output.reshape(-1)
        ref = reference_temporal_iou.reshape(-1)
        u_hmask = (ref > self.pem_high_temporal_iou_threshold).astype(
            jnp.float32)
        u_mmask = ((ref <= self.pem_high_temporal_iou_threshold) &
                   (ref > self.pem_low_temporal_iou_threshold)).astype(
                       jnp.float32)
        u_lmask = (ref <= self.pem_low_temporal_iou_threshold).astype(
            jnp.float32)
        num_h = jnp.sum(u_hmask)
        num_m = jnp.sum(u_mmask)
        num_l = jnp.sum(u_lmask)
        rng_m, rng_l = jax.random.split(rng)
        r_m = jnp.minimum(self.pem_u_ratio_m * num_h /
                          jnp.maximum(num_m, 1), 1.0)
        u_smmask = u_mmask * jax.random.uniform(rng_m, ref.shape)
        u_smmask = (u_smmask > (1.0 - r_m)).astype(jnp.float32)
        r_l = jnp.minimum(self.pem_u_ratio_l * num_h /
                          jnp.maximum(num_l, 1), 1.0)
        u_slmask = u_lmask * jax.random.uniform(rng_l, ref.shape)
        u_slmask = (u_slmask > (1.0 - r_l)).astype(jnp.float32)
        weights = u_hmask + u_smmask + u_slmask
        loss = ((pred - ref)**2) * weights
        return dict(temporal_iou_loss=0.5 * jnp.sum(loss) /
                    jnp.maximum(jnp.sum(weights), 1))
