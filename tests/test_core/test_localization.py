"""Localization stack: proposal utils with hand-computed goldens +
localizer model forwards (reference test model:
tests/test_models/test_localizers.py and
tests/test_localization_utils.py — which the reference has but VFS's
trimmed tree exercises only via SSN; here everything is covered)."""

import numpy as np
import pytest

from vfs_tpu.localization.proposal_utils import (soft_nms, temporal_iop,
                                                 temporal_iou)
from vfs_tpu.localization.ssn_utils import (perform_regression,
                                            temporal_nms)
from vfs_tpu.core.evaluation.proposal import (
    average_recall_at_avg_proposals, pairwise_temporal_iou)


def test_temporal_iou_iop_goldens():
    # proposal [0, 2] vs gt [1, 3]: inter 1, union 3 -> 1/3; iop 1/2
    np.testing.assert_allclose(temporal_iou(0., 2., 1., 3.), 1 / 3)
    np.testing.assert_allclose(temporal_iop(0., 2., 1., 3.), 0.5)
    # vectorized proposals against one gt
    ious = temporal_iou(np.array([0., 4.]), np.array([2., 6.]), 1., 3.)
    np.testing.assert_allclose(ious, [1 / 3, 0.0])
    # identical segments -> 1
    np.testing.assert_allclose(temporal_iou(1., 3., 1., 3.), 1.0)


def test_pairwise_temporal_iou():
    cand = np.array([[0., 2.], [1., 3.]])
    tgt = np.array([[1., 3.]])
    m = pairwise_temporal_iou(cand, tgt)
    np.testing.assert_allclose(np.squeeze(m), [1 / 3, 1.0])


def test_soft_nms_orders_and_decays():
    props = np.array([
        [0.0, 1.0, 0.9],
        [0.05, 1.0, 0.8],   # heavy overlap with the winner -> decayed
        [2.0, 3.0, 0.7],    # disjoint -> untouched
    ])
    out = soft_nms(props, alpha=0.4, low_threshold=0.0,
                   high_threshold=0.0, top_k=10)
    assert out.shape[1] == 3
    # winner kept with its original score, disjoint proposal undecayed
    assert out[0, 2] == pytest.approx(0.9)
    disjoint = out[np.isclose(out[:, 0], 2.0)][0]
    assert disjoint[2] == pytest.approx(0.7)
    overlapped = out[np.isclose(out[:, 0], 0.05)][0]
    assert overlapped[2] < 0.8  # gaussian-decayed


def test_temporal_nms_suppresses():
    dets = np.array([
        [0.0, 1.0, 0.9, 0, 0],
        [0.1, 1.0, 0.8, 0, 0],   # IoU ~0.9 with winner -> suppressed
        [2.0, 3.0, 0.7, 0, 0],
    ])
    kept = temporal_nms(dets, threshold=0.5)
    np.testing.assert_allclose(kept[:, 2], [0.9, 0.7])


def test_perform_regression_identity_and_shift():
    # zero regression -> unchanged (up to clipping)
    d = np.array([[0.2, 0.4, 0.9, 0.0, 0.0]])
    out = perform_regression(d)
    np.testing.assert_allclose(out[0, :2], [0.2, 0.4], atol=1e-7)
    # center shift by +0.5 duration: center 0.3 -> 0.4, duration 0.2
    d2 = np.array([[0.2, 0.4, 0.9, 0.5, 0.0]])
    out2 = perform_regression(d2)
    np.testing.assert_allclose(out2[0, :2], [0.3, 0.5], atol=1e-7)


def test_average_recall_at_avg_proposals_perfect():
    gt = {'v0': np.array([[0., 10.]])}
    # proposals: exact gt segment with top score + noise
    proposals = {'v0': np.array([[0., 10., 0.99], [20., 30., 0.1]])}
    recall, _, _, auc = average_recall_at_avg_proposals(
        gt, proposals, total_num_proposals=2,
        max_avg_proposals=2, temporal_iou_thresholds=np.array([0.5]))
    # with the exact match ranked first, recall at >=1 avg proposals is 1
    assert recall[0, -1] == pytest.approx(1.0)
    assert 0.0 <= auc <= 100.0


def _finite(tree):
    import jax
    return all(bool(np.isfinite(np.asarray(l)).all())
               for l in jax.tree.leaves(tree))


def test_tem_pem_forward_and_loss():
    import jax
    import jax.numpy as jnp
    from vfs_tpu.models import build_model

    tem = build_model(dict(
        type='TEM', temporal_dim=20, boundary_ratio=0.1, tem_feat_dim=16,
        tem_hidden_dim=32, tem_match_threshold=0.5))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 16), jnp.float32)
    v = tem.init(jax.random.PRNGKey(0), x, train=True)
    out = tem.apply(v, x, train=True)
    assert out.shape == (2, 20, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    labels = jnp.asarray(
        np.random.RandomState(1).rand(3, 2, 20) > 0.5, jnp.float32)
    losses = tem.apply(v, out, labels[0], labels[1], labels[2],
                       method=tem.loss)
    assert _finite(losses)

    pem = build_model(dict(
        type='PEM', pem_feat_dim=32, pem_hidden_dim=64, pem_u_ratio_m=1.0,
        pem_u_ratio_l=2.0, pem_high_temporal_iou_threshold=0.6,
        pem_low_temporal_iou_threshold=0.2, soft_nms_alpha=0.75,
        soft_nms_low_threshold=0.65, soft_nms_high_threshold=0.9,
        post_process_top_k=100))
    bsp = jnp.asarray(np.random.RandomState(2).randn(50, 32), jnp.float32)
    vp = pem.init(jax.random.PRNGKey(0), bsp, train=True)
    scores = pem.apply(vp, bsp, train=True)
    assert scores.shape == (50, 1)
    ref_iou = jnp.asarray(np.random.RandomState(3).rand(50), jnp.float32)
    loss = pem.apply(vp, scores, ref_iou, method=pem.loss)
    assert _finite(loss)


def test_bmn_forward_shapes():
    import jax
    import jax.numpy as jnp
    from vfs_tpu.models import build_model

    t = 10
    bmn = build_model(dict(
        type='BMN', temporal_dim=t, boundary_ratio=0.5, num_samples=8,
        num_samples_per_bin=3, feat_dim=16, soft_nms_alpha=0.4,
        soft_nms_low_threshold=0.5, soft_nms_high_threshold=0.9,
        post_process_top_k=100))
    x = jnp.asarray(np.random.RandomState(0).randn(2, t, 16), jnp.float32)
    v = bmn.init(jax.random.PRNGKey(0), x, train=True)
    conf, start, end = bmn.apply(v, x, train=True)
    assert conf.shape == (2, t, t, 2)
    assert start.shape == (2, t) and end.shape == (2, t)
    assert float(start.min()) >= 0.0 and float(end.max()) <= 1.0
