"""BMN temporal action proposal localizer (Flax).

Reference: mmaction/models/localizers/bmn.py:15-470. Channels-last 1-D
features: input ``(N, tscale, feat_dim)``. The boundary-matching sampling
matrix is a constant matmul (MXU) exactly as the reference's
``_boundary_matching_layer``.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...localization import post_processing, temporal_iop, temporal_iou
from ..builder import build_loss
from ..registry import LOCALIZERS


def _conv1d(x, features, kernel, groups=1, name=None, act='relu'):
    y = nn.Conv(features, (kernel,), padding=[(kernel // 2, kernel // 2)],
                feature_group_count=groups, name=name)(x)
    if act == 'relu':
        return nn.relu(y)
    if act == 'sigmoid':
        return jax.nn.sigmoid(y)
    return y


def get_interp1d_mask(tscale, num_samples, num_samples_per_bin,
                      boundary_ratio):
    """Sample-mask constant (reference bmn.py:352-430), shape
    (tscale, num_samples * tscale * tscale)."""

    def bin_mask(seg_tmin, seg_tmax):
        plen = float(seg_tmax - seg_tmin)
        plen_sample = plen / (num_samples * num_samples_per_bin - 1.0)
        total = [seg_tmin + plen_sample * i
                 for i in range(num_samples * num_samples_per_bin)]
        p_mask = []
        for idx in range(num_samples):
            samples = total[idx * num_samples_per_bin:(idx + 1) *
                            num_samples_per_bin]
            vec = np.zeros(tscale)
            for s in samples:
                s_upper = math.ceil(s)
                s_decimal, s_down = math.modf(s)
                if 0 <= int(s_down) <= tscale - 1:
                    vec[int(s_down)] += 1 - s_decimal
                if 0 <= int(s_upper) <= tscale - 1:
                    vec[int(s_upper)] += s_decimal
            p_mask.append(vec / num_samples_per_bin)
        return np.stack(p_mask, axis=1)

    mask_mat = []
    for start_index in range(tscale):
        row = []
        for duration_index in range(tscale):
            if start_index + duration_index < tscale:
                p_tmin = start_index
                p_tmax = start_index + duration_index
                center_len = float(p_tmax - p_tmin) + 1
                row.append(bin_mask(p_tmin - center_len * boundary_ratio,
                                    p_tmax + center_len * boundary_ratio))
            else:
                row.append(np.zeros([tscale, num_samples]))
        mask_mat.append(np.stack(row, axis=2))
    mask_mat = np.stack(mask_mat, axis=3).astype(np.float32)
    return mask_mat.reshape(tscale, -1)


@LOCALIZERS.register_module()
class BMN(nn.Module):
    temporal_dim: int
    boundary_ratio: float
    num_samples: int
    num_samples_per_bin: int
    feat_dim: int
    soft_nms_alpha: float
    soft_nms_low_threshold: float
    soft_nms_high_threshold: float
    post_process_top_k: int
    loss_cls: Any = None
    hidden_dim_1d: int = 256
    hidden_dim_2d: int = 128
    hidden_dim_3d: int = 512
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None

    def setup(self):
        self._loss = build_loss(dict(self.loss_cls or dict(type='BMNLoss')))
        self.sample_mask = jnp.asarray(get_interp1d_mask(
            self.temporal_dim, self.num_samples, self.num_samples_per_bin,
            self.boundary_ratio))

    @property
    def match_map(self):
        tscale = self.temporal_dim
        gap = 1.0 / tscale
        mm = []
        for idx in range(tscale):
            mm.append([[gap * idx, gap * idx + gap * j]
                       for j in range(1, tscale + 1)])
        mm = np.transpose(np.array(mm), [1, 0, 2]).reshape(-1, 2)
        return mm

    def bm_mask(self):
        tscale = self.temporal_dim
        return jnp.asarray(np.array(
            [[1] * (tscale - i) + [0] * i for i in range(tscale)],
            np.float32))

    @nn.compact
    def __call__(self, raw_feature, train: bool = True):
        """raw_feature (N, tscale, feat_dim) -> (confidence_map (N, T, T,
        2), start (N, T), end (N, T))."""
        tscale = self.temporal_dim
        x = _conv1d(raw_feature, self.hidden_dim_1d, 3, groups=4,
                    name='x1db_0')
        base = _conv1d(x, self.hidden_dim_1d, 3, groups=4, name='x1db_1')
        s = _conv1d(base, self.hidden_dim_1d, 3, groups=4, name='x1ds_0')
        start = _conv1d(s, 1, 1, name='x1ds_1', act='sigmoid')[..., 0]
        e = _conv1d(base, self.hidden_dim_1d, 3, groups=4, name='x1de_0')
        end = _conv1d(e, 1, 1, name='x1de_1', act='sigmoid')[..., 0]
        p = _conv1d(base, self.hidden_dim_1d, 3, name='x1dp_0')
        # boundary matching: (N, T, C) x (T, S*T*T) -> (N, C, S, T, T)
        n = p.shape[0]
        bm = jnp.einsum('ntc,tm->ncm', p, self.sample_mask,
                        preferred_element_type=jnp.float32)
        bm = bm.reshape(n, self.hidden_dim_1d, self.num_samples, tscale,
                        tscale)
        # 3d conv over the sample axis: move to NTHWC-style layout
        bm = jnp.moveaxis(bm, 1, -1)  # (N, S, T, T, C)
        bm = nn.Conv(self.hidden_dim_3d, (self.num_samples, 1, 1),
                     padding='VALID', name='x3dp')(bm)
        bm = nn.relu(bm)[:, 0]  # (N, T, T, C3)
        bm = nn.relu(nn.Conv(self.hidden_dim_2d, (1, 1), name='x2dp_0')(bm))
        bm = nn.relu(nn.Conv(self.hidden_dim_2d, (3, 3), padding='SAME',
                             name='x2dp_1')(bm))
        bm = nn.relu(nn.Conv(self.hidden_dim_2d, (3, 3), padding='SAME',
                             name='x2dp_2')(bm))
        confidence_map = jax.nn.sigmoid(
            nn.Conv(2, (1, 1), name='x2dp_3')(bm))  # (N, T, T, 2)
        return confidence_map, start, end

    # -- host-side label generation / inference decode -------------------
    def generate_labels(self, gt_bbox):
        """(reference bmn.py:430-470) gt_bbox: list of (M, 2) arrays."""
        tscale = self.temporal_dim
        match_map = self.match_map
        conf_list, start_list, end_list = [], [], []
        gap = 1.0 / tscale
        # boundary anchors span 2*gap centered on the cell (reference
        # bmn.py:130 _temporal_anchors(-0.5, 1.5)) — NOT the bare cell
        anchors_tmins = np.array([gap * (i - 0.5) for i in range(tscale)])
        anchors_tmaxs = np.array([gap * (i + 1.5) for i in range(tscale)])
        for every_gt_bbox in gt_bbox:
            every_gt_bbox = np.asarray(every_gt_bbox)
            gt_iou_map = []
            for start, end in every_gt_bbox:
                cur = temporal_iou(match_map[:, 0], match_map[:, 1],
                                   start, end)
                gt_iou_map.append(cur.reshape(tscale, tscale))
            gt_iou_map = np.max(np.array(gt_iou_map, np.float32), axis=0)
            gt_tmins = every_gt_bbox[:, 0]
            gt_tmaxs = every_gt_bbox[:, 1]
            gt_len_pad = 3 * gap
            starts = np.stack((gt_tmins - gt_len_pad / 2,
                               gt_tmins + gt_len_pad / 2), axis=1)
            ends = np.stack((gt_tmaxs - gt_len_pad / 2,
                             gt_tmaxs + gt_len_pad / 2), axis=1)
            ms_start = [np.max(temporal_iop(tmin, tmax, starts[:, 0],
                                            starts[:, 1]))
                        for tmin, tmax in zip(anchors_tmins, anchors_tmaxs)]
            ms_end = [np.max(temporal_iop(tmin, tmax, ends[:, 0],
                                          ends[:, 1]))
                      for tmin, tmax in zip(anchors_tmins, anchors_tmaxs)]
            conf_list.append(gt_iou_map)
            start_list.append(ms_start)
            end_list.append(ms_end)
        return (np.array(conf_list, np.float32),
                np.array(start_list, np.float32),
                np.array(end_list, np.float32))

    def loss(self, confidence_map, start, end, label_confidence,
             label_start, label_end, rng=None):
        # reference layout is (N, 2, T, T); ours (N, T, T, 2)
        loss = self._loss(confidence_map, start, end, label_confidence,
                          label_start, label_end, self.bm_mask(), rng=rng)
        return dict(loss=loss[0], tem_loss=loss[1], pem_reg_loss=loss[2],
                    pem_cls_loss=loss[3])

    def decode_proposals(self, confidence_map, start, end, video_meta):
        """Inference decode (reference forward_test, bmn.py:210-270)."""
        tscale = self.temporal_dim
        start_scores = np.asarray(start[0])
        end_scores = np.asarray(end[0])
        reg_confidence = np.asarray(confidence_map[0, ..., 0])
        cls_confidence = np.asarray(confidence_map[0, ..., 1])
        max_start = start_scores.max()
        max_end = end_scores.max()
        start_bins = np.zeros(tscale)
        start_bins[0] = 1
        end_bins = np.zeros(tscale)
        end_bins[-1] = 1
        for idx in range(1, tscale - 1):
            if (start_scores[idx] > start_scores[idx + 1]
                    and start_scores[idx] > start_scores[idx - 1]):
                start_bins[idx] = 1
            elif start_scores[idx] > 0.5 * max_start:
                start_bins[idx] = 1
            if (end_scores[idx] > end_scores[idx + 1]
                    and end_scores[idx] > end_scores[idx - 1]):
                end_bins[idx] = 1
            elif end_scores[idx] > 0.5 * max_end:
                end_bins[idx] = 1
        new_proposals = []
        for idx in range(tscale):
            for jdx in range(tscale):
                start_index = jdx
                end_index = start_index + idx + 1
                if (end_index < tscale and start_bins[start_index] == 1
                        and end_bins[end_index] == 1):
                    tmin = start_index / tscale
                    tmax = end_index / tscale
                    score = (start_scores[start_index] *
                             end_scores[end_index] *
                             cls_confidence[idx, jdx] *
                             reg_confidence[idx, jdx])
                    new_proposals.append([
                        tmin, tmax, start_scores[start_index],
                        end_scores[end_index], cls_confidence[idx, jdx],
                        reg_confidence[idx, jdx], score])
        new_proposals = np.stack(new_proposals)
        video_info = dict(video_meta[0])
        proposal_list = post_processing(
            new_proposals, video_info, self.soft_nms_alpha,
            self.soft_nms_low_threshold, self.soft_nms_high_threshold,
            self.post_process_top_k)
        return [dict(video_name=video_info['video_name'],
                     proposal_list=proposal_list)]
