"""Whole-video decoupled kernel (pallas_affinity_video) parity, interpret
mode on CPU: must match the tiled scan engine (itself parity-tested against
the dense reference loop) bit-for-bit at argmax level and numerically on
logits — including ring wraparound (T > precede_frames), the frame-0
duplication window, tile-remainder edges, and both early-exit settings."""

import jax.numpy as jnp
import numpy as np
import pytest

from vfs_tpu.ops import spatial_neighbor
from vfs_tpu.ops.propagation import PropagationConfig, propagate_video


def _run(seed, t_total, h, w, c, k, nr, p, tile, topk, early_exit=True,
         smooth=False, extract='sweep', engine='v1', **video_kw):
    rng = np.random.RandomState(seed)
    if smooth:
        # temporally coherent features (realistic tau-tightening regime)
        base = rng.randn(h, w, c)
        drift = rng.randn(t_total, h, w, c) * 0.1
        feats = jnp.asarray(base[None] + np.cumsum(drift, 0), jnp.float32)
    else:
        feats = jnp.asarray(rng.randn(t_total, h, w, c), jnp.float32)
    seg_first = jnp.asarray(
        np.eye(k, dtype=np.float32)[rng.randint(0, k, (h, w))])
    common = dict(precede_frames=p, topk=topk, temperature=0.07,
                  neighbor_range=nr, pallas_tile=tile)
    ref = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='tiled', tile=(4, 4),
                                            **common))
    out = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='pallas_video',
                                            pallas_interpret=True,
                                            video_early_exit=early_exit,
                                            video_extract=extract,
                                            video_engine=engine,
                                            **video_kw, **common))
    return np.asarray(ref), np.asarray(out)


@pytest.mark.parametrize('engine', ['v1', 'v2'])
@pytest.mark.parametrize('t_total,h,w,nr,p,tile,topk', [
    (9, 6, 7, 6, 4, (4, 4), 5),      # tile remainder both dims
    (12, 8, 8, 6, 4, (4, 4), 3),     # wraparound: T > P + duplication
    (6, 5, 9, 8, 3, (4, 8), 4),      # wide tile, bigger radius
])
def test_pallas_video_matches_tiled(t_total, h, w, nr, p, tile, topk,
                                    engine):
    ref, out = _run(0, t_total, h, w, 8, 3, nr, p, tile, topk,
                    engine=engine)
    assert (np.argmax(ref, -1) == np.argmax(out, -1)).mean() == 1.0
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('qpair,compact,splits,t_total,p', [
    (1, False, 1, 12, 4),   # plain v2 = v1 structure + new layouts
    (1, True, 1, 12, 4),    # qi-compact stores alone
    (2, True, 1, 12, 4),    # full-window pairing: bank-slot collision
    (2, True, 1, 11, 4),    # even propagated-frame count (no odd tail)
    (2, True, 2, 12, 4),    # bank splits x pairing
    (2, False, 2, 10, 5),   # splits x pairing, uncompacted
    (2, True, 1, 12, 1),    # P=1: the collision pair is the whole bank
    (2, True, 3, 10, 5),    # ragged split sizes
    (2, True, 1, 2, 4),     # T=2: qpair clamps to 1
])
def test_pallas_video_v2_exact(qpair, compact, splits, t_total, p):
    """The v2 kernel's three transforms (query-frame pairing, qi-compact
    stores, j-sorted segment layout) must be invisible in the results
    across the full config matrix, including ring wraparound, the
    frame-0 duplication and the paired-window bank-slot collision."""
    ref, out = _run(21, t_total, 8, 9, 8, 3, 6, p, (4, 4), 5,
                    engine='v2', video_qpair=qpair, video_compact=compact,
                    video_bank_splits=splits)
    assert (np.argmax(ref, -1) == np.argmax(out, -1)).mean() == 1.0
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('qpair,splits', [(1, 1), (2, 1), (2, 2)])
def test_pallas_video_v2_tie_order(qpair, splits):
    """Exact cross-frame score ties (duplicated frames) must resolve in
    torch.topk's global-flat-index order through the j-sorted segment
    layout, under pairing and under bank splits."""
    rng = np.random.RandomState(17)
    t_total, h, w, c, k, nr, p, tile, topk = 10, 8, 9, 8, 3, 6, 4, \
        (4, 4), 5
    feats = rng.randn(t_total, h, w, c)
    feats[3] = feats[1]              # same j arc, distinct bank slots
    feats[7] = feats[5]
    feats = jnp.asarray(feats, jnp.float32)
    seg_first = jnp.asarray(
        np.eye(k, dtype=np.float32)[rng.randint(0, k, (h, w))])
    common = dict(precede_frames=p, topk=topk, temperature=0.07,
                  neighbor_range=nr, pallas_tile=tile)
    ref = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='tiled', **common))
    out = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='pallas_video',
                                            pallas_interpret=True,
                                            video_engine='v2',
                                            video_qpair=qpair,
                                            video_bank_splits=splits,
                                            **common))
    ref, out = np.asarray(ref), np.asarray(out)
    assert (np.argmax(ref, -1) == np.argmax(out, -1)).mean() == 1.0
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('extract,early_exit', [
    ('sweep', True), ('perframe', True), ('perframe', False)])
def test_pallas_video_extract_modes_exact(extract, early_exit):
    """Both extraction structures — and the perframe tau early exit —
    must be invisible in the results, also on temporally-smooth features
    where the exit actually triggers."""
    ref, out = _run(3, 10, 8, 9, 8, 4, 6, 4, (4, 4), 5,
                    early_exit=early_exit, smooth=True, extract=extract)
    assert (np.argmax(ref, -1) == np.argmax(out, -1)).mean() == 1.0
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pallas_video_t2_edge():
    ref, out = _run(5, 2, 5, 6, 8, 2, 6, 4, (4, 4), 3)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pallas_video_bf16_matmul_close():
    """bf16 feature path: selection may flip on rounding, logits stay
    close; shares the v1 kernel's contract (matmul_precision docs)."""
    rng = np.random.RandomState(7)
    t_total, h, w, c, k = 8, 6, 7, 16, 3
    feats = jnp.asarray(rng.randn(t_total, h, w, c), jnp.float32)
    seg_first = jnp.asarray(
        np.eye(k, dtype=np.float32)[rng.randint(0, k, (h, w))])
    common = dict(precede_frames=4, topk=4, temperature=0.07,
                  neighbor_range=6, pallas_tile=(4, 4))
    ref = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='tiled', **common))
    out = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='pallas_video',
                                            pallas_interpret=True,
                                            pallas_precision='bfloat16',
                                            **common))
    agree = (np.argmax(np.asarray(ref), -1)
             == np.argmax(np.asarray(out), -1)).mean()
    assert agree > 0.97


@pytest.mark.parametrize('rows,splits', [(2, 1), (4, 1), (2, 2)])
def test_pallas_video_sweep_rows_exact(rows, splits):
    """Row-group-split sweep extraction (video_sweep_rows, the ILP A/B —
    measured a wash on v5e: the sweep is issue-bound, not latency-bound)
    must be invisible in the results, in both the single-pass and the
    bank-split kernels."""
    rng = np.random.RandomState(13)
    t_total, h, w, c, k, nr, p, tile, topk = 10, 8, 9, 8, 3, 6, 4, (4, 4), 5
    feats = jnp.asarray(rng.randn(t_total, h, w, c), jnp.float32)
    seg_first = jnp.asarray(
        np.eye(k, dtype=np.float32)[rng.randint(0, k, (h, w))])
    common = dict(precede_frames=p, topk=topk, temperature=0.07,
                  neighbor_range=nr, pallas_tile=tile)
    ref = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='tiled', **common))
    out = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='pallas_video',
                                            pallas_interpret=True,
                                            video_engine='v1',
                                            video_sweep_rows=rows,
                                            video_bank_splits=splits,
                                            **common))
    ref, out = np.asarray(ref), np.asarray(out)
    assert (np.argmax(ref, -1) == np.argmax(out, -1)).mean() == 1.0
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('splits', [1, 2])
def test_pallas_video_pass_mode_argmax_exact(splits):
    """'argmax' per-pass formulation (jnp.argmax + jnp.max — independent
    reductions, fusable into one traversal; measured SLOWER on v5e: 4.12
    vs 3.47 ms/frame bf16mm r18 — the argmax lowering costs more than the
    saved traversal) must be exact: argmax also returns the first
    occurrence on ties, the torch.topk tie rule."""
    rng = np.random.RandomState(17)
    t_total, h, w, c, k, nr, p, tile, topk = 10, 8, 9, 8, 3, 6, 4, (4, 4), 5
    feats = jnp.asarray(rng.randn(t_total, h, w, c), jnp.float32)
    # exact ties across the mask boundary exercise the tie rule
    feats = feats.at[3].set(feats[1])
    seg_first = jnp.asarray(
        np.eye(k, dtype=np.float32)[rng.randint(0, k, (h, w))])
    common = dict(precede_frames=p, topk=topk, temperature=0.07,
                  neighbor_range=nr, pallas_tile=tile)
    ref = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='tiled', **common))
    out = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='pallas_video',
                                            pallas_interpret=True,
                                            video_engine='v1',
                                            video_pass_mode='argmax',
                                            video_bank_splits=splits,
                                            **common))
    ref, out = np.asarray(ref), np.asarray(out)
    assert (np.argmax(ref, -1) == np.argmax(out, -1)).mean() == 1.0
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('engine', ['v1', 'v2'])
@pytest.mark.parametrize('splits,t_total,p', [
    (2, 12, 4),   # wraparound + cross-split frame-0 duplication
    (2, 6, 4),    # split 2 has no valid frames for small t
    (3, 10, 5),   # ragged split sizes
])
def test_pallas_video_bank_splits_exact(splits, t_total, p, engine):
    """Bank-split passes (separate VMEM rings per contiguous offset
    range, exact lexicographic merge in XLA) must reproduce the
    single-pass results bit-for-bit on the tiled reference."""
    rng = np.random.RandomState(11)
    h, w, c, k, nr, tile, topk = 8, 9, 8, 3, 6, (4, 4), 5
    feats = jnp.asarray(rng.randn(t_total, h, w, c), jnp.float32)
    seg_first = jnp.asarray(
        np.eye(k, dtype=np.float32)[rng.randint(0, k, (h, w))])
    common = dict(precede_frames=p, topk=topk, temperature=0.07,
                  neighbor_range=nr, pallas_tile=tile)
    ref = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='tiled', **common))
    out = propagate_video(feats, seg_first, None,
                          PropagationConfig(backend='pallas_video',
                                            pallas_interpret=True,
                                            video_engine=engine,
                                            video_bank_splits=splits,
                                            **common))
    ref, out = np.asarray(ref), np.asarray(out)
    assert (np.argmax(ref, -1) == np.argmax(out, -1)).mean() == 1.0
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
