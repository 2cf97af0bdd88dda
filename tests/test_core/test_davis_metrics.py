"""Unit tests for the in-repo DAVIS J&F math."""

import numpy as np
import pytest

from vfs_tpu.core.evaluation.davis import (db_eval_boundary, db_eval_iou,
                                           db_statistics,
                                           evaluate_semisupervised,
                                           f_measure_frame, seg2bmap)


def test_iou_basic():
    a = np.zeros((2, 10, 10), bool)
    b = np.zeros((2, 10, 10), bool)
    a[0, :5] = True
    b[0, :5] = True          # perfect frame 0
    a[1, :4] = True
    b[1, 2:6] = True         # frame 1: inter 2 rows, union 6 rows
    j = db_eval_iou(a, b)
    assert j[0] == pytest.approx(1.0)
    assert j[1] == pytest.approx(20.0 / 60.0)


def test_iou_empty_both_is_one():
    a = np.zeros((1, 4, 4), bool)
    b = np.zeros((1, 4, 4), bool)
    assert db_eval_iou(a, b)[0] == pytest.approx(1.0)


def test_iou_void_excluded():
    a = np.zeros((1, 4, 4), bool)
    b = np.zeros((1, 4, 4), bool)
    a[0, 0] = True
    void = np.zeros((1, 4, 4), bool)
    void[0, 0] = True  # disagreement region is void
    assert db_eval_iou(a, b, void)[0] == pytest.approx(1.0)


def test_boundary_perfect_and_disjoint():
    m = np.zeros((1, 20, 20), bool)
    m[0, 5:15, 5:15] = True
    assert db_eval_boundary(m, m)[0] == pytest.approx(1.0)
    other = np.zeros_like(m)
    other[0, 0:2, 0:2] = True
    assert db_eval_boundary(m, other)[0] < 0.5


def test_f_measure_empty_cases():
    empty = np.zeros((10, 10), bool)
    full = np.zeros((10, 10), bool)
    full[4:6, 4:6] = True
    assert f_measure_frame(empty, empty) == pytest.approx(1.0)
    assert f_measure_frame(empty, full) == pytest.approx(0.0)  # P=1, R=0
    assert f_measure_frame(full, empty) == pytest.approx(0.0)  # P=0, R=1


def test_seg2bmap_square():
    m = np.zeros((8, 8), bool)
    m[2:6, 2:6] = True
    b = seg2bmap(m)
    # interior pixels are not boundary
    assert not b[3:5, 3:5].any() or b[3, 3] == False  # noqa: E712
    assert b.any()


def test_db_statistics_decay():
    vals = np.array([1.0, 1.0, 0.8, 0.8, 0.6, 0.6, 0.4, 0.4])
    m, r, d = db_statistics(vals)
    assert m == pytest.approx(vals.mean())
    assert r == pytest.approx((vals > 0.5).mean())
    assert d > 0  # decaying sequence


def test_evaluate_semisupervised_excludes_first_last():
    t, h, w = 5, 12, 12
    gt = np.zeros((t, h, w), np.int64)
    gt[:, 2:6, 2:6] = 1
    pred = gt.copy()
    # corrupt only first and last frames: metric must stay perfect
    pred[0] = 0
    pred[-1] = 0
    res = evaluate_semisupervised(gt, pred)
    assert np.allclose(res['J'][1], 1.0)
    assert np.allclose(res['F'][1], 1.0)
