"""Pallas fused kernel parity (interpret mode on CPU) against the tiled
XLA path (itself parity-tested against the dense reference)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vfs_tpu.ops.affinity import l2_normalize
from vfs_tpu.ops.local_attention_tiled import local_masked_topk_attend
from vfs_tpu.ops.pallas_attention import (pad_for_pallas,
                                          pallas_local_topk_attend)


@pytest.mark.parametrize('h,w,nr,tile,topk', [
    (12, 14, 6, (4, 8), 4),
    (10, 11, 8, (8, 8), 3),   # non-divisible both dims
])
def test_pallas_interpret_parity(h, w, nr, tile, topk):
    rng = np.random.RandomState(0)
    f, c, k = 5, 16, 3
    radius = nr // 2
    query = l2_normalize(jnp.asarray(rng.randn(h, w, c), jnp.float32), -1)
    bank_f = l2_normalize(
        jnp.asarray(rng.randn(f, h, w, c), jnp.float32), -1)
    bank_v = jnp.asarray(rng.rand(f, h, w, k), jnp.float32)
    valid = jnp.asarray([1, 1, 1, 0, 0])
    ref = local_masked_topk_attend(query, bank_f, bank_v,
                                   valid.astype(bool), radius=radius,
                                   temperature=0.07, topk=topk, tile=(4, 4))
    out = pallas_local_topk_attend(
        pad_for_pallas(query, h, w, radius, tile),
        pad_for_pallas(bank_f, h, w, radius, tile),
        bank_v, valid, radius=radius, temperature=0.07, topk=topk,
        h=h, w=w, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('h,w,nr,tile,topk', [
    (12, 14, 6, (4, 8), 4),
])
def test_pallas_v2_interpret_parity(h, w, nr, tile, topk):
    from vfs_tpu.ops.pallas_attention_v2 import pallas_local_topk_attend_v2
    rng = np.random.RandomState(0)
    f, c, k = 5, 16, 3
    radius = nr // 2
    query = l2_normalize(jnp.asarray(rng.randn(h, w, c), jnp.float32), -1)
    bank_f = l2_normalize(
        jnp.asarray(rng.randn(f, h, w, c), jnp.float32), -1)
    bank_v = jnp.asarray(rng.rand(f, h, w, k), jnp.float32)
    valid = jnp.asarray([1, 1, 1, 0, 0])
    ref = local_masked_topk_attend(query, bank_f, bank_v,
                                   valid.astype(bool), radius=radius,
                                   temperature=0.07, topk=topk, tile=(4, 4))
    out = pallas_local_topk_attend_v2(
        pad_for_pallas(query, h, w, radius, tile),
        pad_for_pallas(bank_f, h, w, radius, tile),
        bank_v, valid, radius=radius, temperature=0.07, topk=topk,
        h=h, w=w, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_bf16_scores_close():
    """scores_dtype='bfloat16' (half the top-k sweep bytes) must stay
    within bf16 rounding of the exact fp32 kernel: the propagated logits
    are convex combinations of [0,1] values, so the tolerance is the
    softmax response to a ~1e-2 relative score perturbation."""
    rng = np.random.RandomState(1)
    h, w, f, c, k, topk = 12, 14, 5, 16, 3, 4
    radius, tile = 3, (4, 8)
    query = l2_normalize(jnp.asarray(rng.randn(h, w, c), jnp.float32), -1)
    bank_f = l2_normalize(
        jnp.asarray(rng.randn(f, h, w, c), jnp.float32), -1)
    bank_v = jnp.asarray(rng.rand(f, h, w, k), jnp.float32)
    valid = jnp.ones((f,), jnp.int32)
    qp = pad_for_pallas(query, h, w, radius, tile)
    bp = pad_for_pallas(bank_f, h, w, radius, tile)
    outs = {
        sd: np.asarray(pallas_local_topk_attend(
            qp, bp, bank_v, valid, radius=radius, temperature=0.07,
            topk=topk, h=h, w=w, tile=tile, interpret=True,
            scores_dtype=sd))
        for sd in ('float32', 'bfloat16')
    }
    # same argmax decision almost everywhere, logits close
    agree = (outs['float32'].argmax(-1) ==
             outs['bfloat16'].argmax(-1)).mean()
    assert agree >= 0.99, agree
    np.testing.assert_allclose(outs['bfloat16'], outs['float32'],
                               rtol=0.15, atol=0.08)


def test_pallas_bf16_matmul_close():
    """matmul_precision='bfloat16' (one native MXU pass instead of the
    6-pass fp32 emulation — the production speed mode) rounds only the
    QK^T inputs; scores/extraction stay fp32. Must match the exact
    kernel's argmax decisions almost everywhere with close logits."""
    rng = np.random.RandomState(2)
    h, w, f, c, k, topk = 12, 14, 5, 16, 3, 4
    radius, tile = 3, (4, 8)
    query = l2_normalize(jnp.asarray(rng.randn(h, w, c), jnp.float32), -1)
    bank_f = l2_normalize(
        jnp.asarray(rng.randn(f, h, w, c), jnp.float32), -1)
    bank_v = jnp.asarray(rng.rand(f, h, w, k), jnp.float32)
    valid = jnp.ones((f,), jnp.int32)
    qp = pad_for_pallas(query, h, w, radius, tile)
    bp = pad_for_pallas(bank_f, h, w, radius, tile)
    outs = {
        mp: np.asarray(pallas_local_topk_attend(
            qp, bp, bank_v, valid, radius=radius, temperature=0.07,
            topk=topk, h=h, w=w, tile=tile, interpret=True,
            matmul_precision=mp))
        for mp in ('float32', 'bfloat16')
    }
    agree = (outs['float32'].argmax(-1) ==
             outs['bfloat16'].argmax(-1)).mean()
    assert agree >= 0.99, agree
    np.testing.assert_allclose(outs['bfloat16'], outs['float32'],
                               rtol=0.15, atol=0.08)


@pytest.mark.parametrize('h,w,nr,tile,topk', [
    (12, 14, 6, (4, 8), 4),
    (10, 11, 8, (8, 8), 3),   # non-divisible both dims, padded lanes
])
def test_pallas_packed_extract_parity(h, w, nr, tile, topk):
    """extract_mode='packed' (single int-max top-k passes over
    16-bit-quantized (score, index) packs + exact-score epilogue) must
    reproduce the exact kernel away from sub-4.6e-4 score ties — on
    random inputs that is everywhere."""
    rng = np.random.RandomState(7)
    f, c, k = 5, 16, 3
    radius = nr // 2
    query = l2_normalize(jnp.asarray(rng.randn(h, w, c), jnp.float32), -1)
    bank_f = l2_normalize(
        jnp.asarray(rng.randn(f, h, w, c), jnp.float32), -1)
    bank_v = jnp.asarray(rng.rand(f, h, w, k), jnp.float32)
    valid = jnp.asarray([1, 1, 1, 0, 0])
    qp = pad_for_pallas(query, h, w, radius, tile)
    bp = pad_for_pallas(bank_f, h, w, radius, tile)
    outs = {
        em: np.asarray(pallas_local_topk_attend(
            qp, bp, bank_v, valid, radius=radius, temperature=0.07,
            topk=topk, h=h, w=w, tile=tile, interpret=True,
            extract_mode=em))
        for em in ('mask', 'packed')
    }
    agree = (outs['mask'].argmax(-1) == outs['packed'].argmax(-1)).mean()
    assert agree == 1.0, agree
    # identical selections -> identical softmax inputs up to the
    # epilogue's re-dot accumulation order
    np.testing.assert_allclose(outs['packed'], outs['mask'],
                               rtol=1e-4, atol=1e-5)


def test_pallas_packed_index_overflow_raises():
    """packed mode packs the flat key index into 16 bits; banks whose
    padded key space exceeds 65536 must be rejected, not corrupted."""
    h, w, f, c, k = 12, 14, 60, 8, 2
    radius, tile = 10, (8, 8)
    query = jnp.zeros((h, w, c), jnp.float32)
    bank_f = jnp.zeros((f, h, w, c), jnp.float32)
    bank_v = jnp.zeros((f, h, w, k), jnp.float32)
    valid = jnp.ones((f,), jnp.int32)
    qp = pad_for_pallas(query, h, w, radius, tile)
    bp = pad_for_pallas(bank_f, h, w, radius, tile)
    with pytest.raises(ValueError, match='65536'):
        pallas_local_topk_attend(
            qp, bp, bank_v, valid, radius=radius, temperature=0.07,
            topk=3, h=h, w=w, tile=tile, interpret=True,
            extract_mode='packed')


def test_propagation_cfg_bf16_matmul():
    """The PropagationConfig knob routes through propagate_video (the
    production scan) and stays close to the exact path."""
    from vfs_tpu.ops.propagation import PropagationConfig, propagate_video
    rng = np.random.RandomState(4)
    t, h, w, c, k = 6, 12, 14, 16, 3
    feats = jnp.asarray(rng.randn(t, h, w, c), jnp.float32)
    seg = jnp.zeros((h, w, k), jnp.float32).at[..., 0].set(1.0)
    seg = seg.at[3:8, 4:10, 0].set(0.0).at[3:8, 4:10, 1].set(1.0)
    base = dict(precede_frames=3, topk=4, temperature=0.07,
                with_first=True, with_first_neighbor=True, with_norm=True,
                neighbor_range=6, backend='pallas', pallas_tile=(4, 8),
                pallas_interpret=True)
    outs = {}
    for mp in ('float32', 'bfloat16'):
        cfg = PropagationConfig(**base, pallas_precision=mp)
        outs[mp] = np.asarray(propagate_video(feats, seg, None, cfg))
    agree = (outs['float32'].argmax(-1) ==
             outs['bfloat16'].argmax(-1)).mean()
    assert agree >= 0.98, agree


def test_pallas_extract_modes_identical():
    """'descent' (read-only strict lexicographic descent) must be
    bit-identical to the default 'mask' extraction, including duplicate
    scores (tie rule: lowest flat index first)."""
    rng = np.random.RandomState(3)
    h, w, f, c, k, topk = 12, 14, 4, 16, 3, 4
    radius, tile = 3, (4, 8)
    query = l2_normalize(jnp.asarray(rng.randn(h, w, c), jnp.float32), -1)
    # duplicate one bank frame so exact score ties occur across frames
    base = rng.randn(f - 1, h, w, c)
    bank = np.concatenate([base, base[:1]], axis=0)
    bank_f = l2_normalize(jnp.asarray(bank, jnp.float32), -1)
    bank_v = jnp.asarray(rng.rand(f, h, w, k), jnp.float32)
    valid = jnp.ones((f,), jnp.int32)
    qp = pad_for_pallas(query, h, w, radius, tile)
    bp = pad_for_pallas(bank_f, h, w, radius, tile)
    outs = {
        mode: np.asarray(pallas_local_topk_attend(
            qp, bp, bank_v, valid, radius=radius, temperature=0.07,
            topk=topk, h=h, w=w, tile=tile, interpret=True,
            extract_mode=mode))
        for mode in ('mask', 'descent')
    }
    np.testing.assert_array_equal(outs['mask'], outs['descent'])


def test_pallas_store_modes_identical():
    """'memset' (pre-fill pad lanes once, store unpadded rows) must be
    bit-identical to the default per-frame padded-concat store.
    Measured on v5e: no speed difference (6.91 vs 6.88 ms/frame) — the
    per-frame concatenate is not a cost; the flag documents the
    negative result."""
    rng = np.random.RandomState(6)
    h, w, f, c, k, topk = 12, 14, 4, 16, 3, 4
    radius, tile = 3, (4, 8)
    query = l2_normalize(jnp.asarray(rng.randn(h, w, c), jnp.float32), -1)
    bank_f = l2_normalize(
        jnp.asarray(rng.randn(f, h, w, c), jnp.float32), -1)
    bank_v = jnp.asarray(rng.rand(f, h, w, k), jnp.float32)
    valid = jnp.ones((f,), jnp.int32)
    qp = pad_for_pallas(query, h, w, radius, tile)
    bp = pad_for_pallas(bank_f, h, w, radius, tile)
    outs = {
        sm: np.asarray(pallas_local_topk_attend(
            qp, bp, bank_v, valid, radius=radius, temperature=0.07,
            topk=topk, h=h, w=w, tile=tile, interpret=True,
            store_mode=sm))
        for sm in ('concat', 'memset')
    }
    np.testing.assert_array_equal(outs['concat'], outs['memset'])


@pytest.mark.parametrize('h,w,nr,tile,topk,gf', [
    (12, 14, 6, (4, 8), 4, None),   # single group (auto)
    (10, 11, 8, (8, 8), 3, 2),      # 3 groups of 2 over 5 frames (ragged)
    (12, 14, 6, (4, 8), 4, 1),      # degenerate: per-frame groups
])
def test_pallas_batched_matmul_parity(h, w, nr, tile, topk, gf):
    """matmul_mode='batched' (one MXU dot per frame group, batched
    mask+validity add, lane-aligned frame segments) must be EXACT vs the
    tiled XLA path, including ragged last groups and invalid slots."""
    rng = np.random.RandomState(1)
    f, c, k = 5, 16, 3
    radius = nr // 2
    query = l2_normalize(jnp.asarray(rng.randn(h, w, c), jnp.float32), -1)
    bank_f = l2_normalize(
        jnp.asarray(rng.randn(f, h, w, c), jnp.float32), -1)
    bank_v = jnp.asarray(rng.rand(f, h, w, k), jnp.float32)
    valid = jnp.asarray([1, 1, 1, 0, 1])  # hole in the middle slots
    ref = local_masked_topk_attend(query, bank_f, bank_v,
                                   valid.astype(bool), radius=radius,
                                   temperature=0.07, topk=topk, tile=(4, 4))
    out = pallas_local_topk_attend(
        pad_for_pallas(query, h, w, radius, tile, matmul_mode='batched'),
        pad_for_pallas(bank_f, h, w, radius, tile, matmul_mode='batched'),
        bank_v, valid, radius=radius, temperature=0.07, topk=topk,
        h=h, w=w, tile=tile, interpret=True, matmul_mode='batched',
        group_frames=gf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
