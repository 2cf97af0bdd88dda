"""Fused Pallas kernel for circle-masked top-k label propagation.

The flagship TPU kernel (SURVEY §5 "long-context" row: fuse
normalize+QKᵀ+mask+topk into one VMEM-resident pass). Per query tile it

  1. DMAs the tile's dilated key block of every bank frame HBM->VMEM
     (double buffered),
  2. computes scores on the MXU into a VMEM-resident (Q, F*KB) buffer —
     scores never touch HBM (the XLA paths spill hundreds of MB per frame),
  3. applies the circle mask (coordinate math, computed once per tile) and
     per-frame bank validity,
  4. extracts the exact top-k by k *unrolled* passes of row-max +
     first-occurrence one-hot (tie order = lowest flat index, matching
     torch.topk on the reference path),

and returns ``(top_scores, top_flat_idx)`` per query. The cheap epilogue —
value gather + softmax + weighted sum over k entries — runs in XLA
(``pallas_local_topk_attend``), sidestepping Mosaic's 128-alignment limits
on the tiny class dimension.

Equivalence contract: identical to
``local_attention_tiled.local_masked_topk_attend`` (itself parity-tested
against the dense reference) for pre-normalized inputs.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


INT_MIN = -2**31  # python int: pallas kernels may not capture jnp scalars
# packed mode: scores quantized to 16 bits over [-15, 15] (valid scores
# are |dot|/tau <= 1/0.07 = 14.3; masked = NEG_INF clips to the -15
# sentinel, below every valid score) -> absolute selection step
# 30/2^16 = 4.6e-4
PACKED_SCALE = 65536.0 / 30.0


def _topk_tail(scores_buf, out_s_ref, out_i_ref, q_n, total_k, topk,
               extract_mode, scores_dtype):
    """Top-k extraction tail shared by the kernel variants: k unrolled
    passes of row-max + first-occurrence (tie rule: lowest flat index
    first, torch.topk parity)."""
    if extract_mode == 'packed':
        # scores_buf holds (quantized_score << 16) | (0xFFFF - col):
        # ONE int max per pass yields value AND index together, and the
        # mask-out predicate is a plain equality — 4 VPU ops/element/pass
        # vs 7 for 'mask' (measured issue-bound, PROGRESS r2). Selection
        # is by the quantized score (ties -> lowest flat index); the
        # epilogue recomputes exact scores for the softmax from the
        # returned indices.
        top_i = []
        for p in range(topk):
            s = scores_buf[:]
            m = jnp.max(s, axis=1, keepdims=True)       # (Q, 1) packed
            top_i.append(0xFFFF - (m & 0xFFFF))
            if p + 1 < topk:
                scores_buf[:] = jnp.where(s == m, INT_MIN, s)
        out_s_ref[0, 0] = jnp.zeros((q_n, topk), jnp.float32)
        out_i_ref[0, 0] = jnp.concatenate(top_i, axis=1)
        return
    col = lax.broadcasted_iota(jnp.int32, (q_n, total_k), 1)
    top_s = []
    top_i = []
    # bf16 scores: the sweep reads half the VMEM bytes; compare in f32
    # registers (bf16 predicates trip a Mosaic i1-relayout bug and bf16
    # compare throughput is no better)
    read = (lambda: scores_buf[:].astype(jnp.float32)) \
        if scores_dtype != jnp.float32 else (lambda: scores_buf[:])
    if extract_mode == 'descent':
        # strict lexicographic descent: pass p finds the row max among
        # elements strictly after the previous pick in (value desc,
        # index asc) order. Read-only (no mask-out stores) — but
        # measured 12% SLOWER than 'mask' on v5e (9.5 vs 8.5 ms/frame,
        # DAVIS-480p shapes): the passes are VPU-issue-bound, not
        # store-bound, and the eligibility predicate costs ~2 extra
        # ops/element. Kept as the bit-exact A/B reference.
        prev_v = None
        prev_i = None
        for p in range(topk):
            s = read()
            if p:
                s = jnp.where(
                    (s < prev_v) | ((s == prev_v) & (col > prev_i)),
                    s, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)      # (Q, 1)
            first_idx = jnp.min(jnp.where(s >= m, col, total_k),
                                axis=1, keepdims=True)
            top_s.append(m)
            top_i.append(first_idx)
            prev_v, prev_i = m, first_idx
    else:  # 'mask': row-max + first-occurrence one-hot mask-out
        for p in range(topk):
            s = read()
            m = jnp.max(s, axis=1, keepdims=True)      # (Q, 1)
            eq = s >= m
            # first index attaining the max (ties -> lowest flat
            # index, the torch.topk rule). Alternatives measured
            # SLOWER on v5e: jnp.argmax(s) lowers to 10.9 ms/frame vs
            # 9.9 for where+min; argmax over the bool mask doesn't
            # lower at all (Mosaic argmax is f32-only).
            first_idx = jnp.min(jnp.where(eq, col, total_k), axis=1,
                                keepdims=True)
            top_s.append(m)
            top_i.append(first_idx)
            if p + 1 < topk:
                scores_buf[:] = jnp.where(
                    col == first_idx, NEG_INF, s).astype(scores_dtype)
    out_s_ref[0, 0] = jnp.concatenate(
        top_s, axis=1).astype(jnp.float32)             # (Q, topk)
    out_i_ref[0, 0] = jnp.concatenate(top_i, axis=1)


def _batched_geometry(th, tw, r, rw):
    """Key-block geometry for the batched-matmul kernel: kbh is rounded
    up so each frame's key block (kb_n = kbh2*kbw elements) is a
    128-multiple — frame segments in the scores buffer then self-align
    with NO per-frame pad lanes, and a whole group of frames can be
    scored by ONE MXU matmul writing one contiguous store. The extra
    rows sit >= r+1 below every query row of the tile, i.e. provably
    outside the circle radius, so the standard mask already removes
    them."""
    kbh = th + 2 * r
    kbw = tw + 2 * rw
    g128 = 128 // math.gcd(kbw, 128)
    kbh2 = _round_up(kbh, g128)
    return kbh2, kbw, kbh2 - kbh


def _make_kernel_batched(th, tw, r, rw, radius, h, w, c, f_frames, topk,
                         temperature, extract_mode='mask',
                         scores_dtype=jnp.float32,
                         feat_dtype=jnp.float32, group_frames=None):
    """Batched-matmul kernel variant (VERDICT r2 item 2): instead of one
    small (q_n, C)x(C, kb) dot per bank frame — measured as the
    dominant per-frame fixed cost, ~0.25 ms/bank-frame of non-DMA
    overhead — score a GROUP of G frames with a single
    (q_n, C)x(C, G*kb_n) MXU call, apply circle-mask + slot-validity as
    one batched add (G concatenated (q_n, kb_n) pieces), and store the
    whole group segment once. Groups are statically unrolled and
    double-buffered through VMEM; G=F for r18-sized banks (one matmul
    for the whole bank), smaller G where the key block would blow the
    VMEM budget (r50)."""
    kbh2, kbw, _ = _batched_geometry(th, tw, r, rw)
    q_n = th * tw
    kb_n = kbh2 * kbw
    total_k = f_frames * kb_n
    G = group_frames
    n_groups = -(-f_frames // G)
    n_slots = 1 if n_groups == 1 else 2

    def kernel(valid_ref, query_ref, bank_feats_ref, mask_ref, out_s_ref,
               out_i_ref, q_buf, key_buf, scores_buf, mask_buf, sem_q,
               sem_k, sem_m):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        oy = ti * th
        ox = tj * tw

        cp_q = pltpu.make_async_copy(
            query_ref.at[pl.ds(oy + r, th), pl.ds(ox + rw, tw), :],
            q_buf, sem_q)
        cp_q.start()
        cp_m = pltpu.make_async_copy(mask_ref.at[ti, tj], mask_buf, sem_m)
        cp_m.start()

        def group_copy(g, slot):
            g0 = g * G
            gg = min(G, f_frames - g0)
            dst = key_buf.at[slot] if gg == G \
                else key_buf.at[slot, pl.ds(0, gg)]
            return pltpu.make_async_copy(
                bank_feats_ref.at[pl.ds(g0, gg), pl.ds(oy, kbh2),
                                  pl.ds(ox, kbw), :],
                dst, sem_k.at[slot])

        group_copy(0, 0).start()
        cp_m.wait()
        cp_q.wait()
        q = q_buf[:].reshape(q_n, c)

        for g in range(n_groups):  # static unroll (<= F iterations)
            slot = g % n_slots
            if g + 1 < n_groups:
                group_copy(g + 1, (g + 1) % n_slots).start()
            group_copy(g, slot).wait()
            g0 = g * G
            gg = min(G, f_frames - g0)
            keys = (key_buf[slot] if gg == G
                    else key_buf[slot, :gg]).reshape(gg * kb_n, c)
            scores = lax.dot_general(
                q, keys, (((1,), (1,)), ((), ())),
                precision=(lax.Precision.DEFAULT
                           if feat_dtype == jnp.bfloat16
                           else lax.Precision.HIGHEST),
                preferred_element_type=jnp.float32) * (1.0 / temperature)
            # circle mask + per-slot validity in ONE add: gg aligned
            # (q_n, kb_n) pieces concatenated along lanes
            pieces = []
            for i in range(gg):
                vt = jnp.where(valid_ref[g0 + i] > 0, 0.0, NEG_INF)
                pieces.append(mask_buf[:] + vt)
            madd = pieces[0] if gg == 1 \
                else jnp.concatenate(pieces, axis=1)
            scores = (scores + madd).astype(scores_dtype)
            scores_buf[:, pl.ds(g0 * kb_n, gg * kb_n)] = scores

        _topk_tail(scores_buf, out_s_ref, out_i_ref, q_n, total_k, topk,
                   extract_mode, scores_dtype)

    return kernel, kbh2, kbw, kb_n, total_k, q_n, n_slots


def _make_kernel(th, tw, r, rw, radius, h, w, c, f_frames, topk,
                 temperature, extract_mode='mask',
                 scores_dtype=jnp.float32, fetch_mode='perframe',
                 feat_dtype=jnp.float32, store_mode='concat'):
    # Mosaic constraints: HBM DMA slice offsets on the second-to-last dim
    # must be 8-aligned -> the W padding is rounded up to 8 (rw) and key
    # blocks are fetched at the tile origin with width tw + 2*rw; the mask
    # handles the extra columns.
    kbh = th + 2 * r
    kbw = tw + 2 * rw
    q_n = th * tw
    kb_n = kbh * kbw
    kb_pad = _round_up(kb_n, 128)
    total_k = f_frames * kb_pad

    def kernel(valid_ref, query_ref, bank_feats_ref, mask_ref, out_s_ref,
               out_i_ref, q_buf, key_buf, scores_buf, mask_buf, sem_q,
               sem_k, sem_m):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        oy = ti * th
        ox = tj * tw

        cp_q = pltpu.make_async_copy(
            query_ref.at[pl.ds(oy + r, th), pl.ds(ox + rw, tw), :],
            q_buf, sem_q)
        cp_q.start()
        # additive circle+boundary mask, precomputed per tile on the host
        # side of the jit (Mosaic's vector int div/mod lowering is
        # unreliable; see commit history)
        cp_m = pltpu.make_async_copy(mask_ref.at[ti, tj], mask_buf, sem_m)
        cp_m.start()
        cp_m.wait()
        cp_q.wait()

        if fetch_mode == 'whole':
            # one strided DMA for the tile's key block of EVERY bank frame
            # (the per-frame loop's DMA waits cost ~2 us each; 21 of them
            # per tile add up — see PROGRESS round-2 kernel probes)
            cp_k = pltpu.make_async_copy(
                bank_feats_ref.at[:, pl.ds(oy, kbh), pl.ds(ox, kbw), :],
                key_buf, sem_k.at[0])
            cp_k.start()
            cp_k.wait()
        else:
            def key_copy(f, slot):
                return pltpu.make_async_copy(
                    bank_feats_ref.at[f, pl.ds(oy, kbh), pl.ds(ox, kbw), :],
                    key_buf.at[slot], sem_k.at[slot])

            key_copy(0, 0).start()
        q = q_buf[:].reshape(q_n, c)
        col_iota = (lax.broadcasted_iota(jnp.int32, (q_n, kb_n), 1)
                    if extract_mode == 'packed' else None)
        if store_mode == 'memset' and kb_pad > kb_n:
            # fill the pad lanes once instead of re-concatenating a
            # padded copy every frame (A/B experiment)
            scores_buf[:] = jnp.full((q_n, total_k), NEG_INF, scores_dtype)

        def frame_body(f, _):
            if fetch_mode == 'whole':
                keys = key_buf[f].reshape(kb_n, c)
            else:
                slot = lax.rem(f, 2)

                @pl.when(f + 1 < f_frames)
                def _():
                    key_copy(f + 1, lax.rem(f + 1, 2)).start()

                key_copy(f, slot).wait()
                keys = key_buf[slot].reshape(kb_n, c)
            # fp32 features: HIGHEST = 6-pass bf16 emulation on the MXU
            # (exact). bf16 features: one native MXU pass with an fp32
            # accumulator — 6x fewer MXU passes and half the key DMA/VMEM
            # bytes, at bf16 input rounding (see matmul_precision docs).
            scores = lax.dot_general(
                q, keys, (((1,), (1,)), ((), ())),
                precision=(lax.Precision.DEFAULT
                           if feat_dtype == jnp.bfloat16
                           else lax.Precision.HIGHEST),
                preferred_element_type=jnp.float32) * (1.0 / temperature)
            scores = scores + mask_buf[:, :kb_n]  # additive mask
            scores = jnp.where(valid_ref[f] > 0, scores, NEG_INF)
            # kb_pad is a 128-multiple, so the dynamic lane offset is
            # provably aligned
            off = pl.multiple_of(f * kb_pad, 128)
            if extract_mode == 'packed':
                # quantize + pack (score, flat col) into one int32 at
                # store time — the scores are already in registers here,
                # so the pack costs no extra sweep (see _topk_tail)
                qs = jnp.round(jnp.clip(scores, -15.0, 15.0) *
                               PACKED_SCALE).astype(jnp.int32)
                inv = (0xFFFF - off) - col_iota
                scores = qs * 65536 + inv
                if kb_pad > kb_n:
                    scores = jnp.concatenate(
                        [scores,
                         jnp.full((q_n, kb_pad - kb_n), INT_MIN,
                                  jnp.int32)], axis=1)
                scores_buf[:, pl.ds(off, kb_pad)] = scores
                return 0
            # bf16 scores (the extraction passes sweep half the bytes;
            # bf16 shares f32's exponent so NEG_INF survives the cast)
            scores = scores.astype(scores_dtype)
            if store_mode == 'memset' and kb_pad > kb_n:
                scores_buf[:, pl.ds(off, kb_n)] = scores
            else:
                if kb_pad > kb_n:
                    scores = jnp.concatenate(
                        [scores,
                         jnp.full((q_n, kb_pad - kb_n), NEG_INF,
                                  scores_dtype)], axis=1)
                scores_buf[:, pl.ds(off, kb_pad)] = scores
            return 0

        lax.fori_loop(0, f_frames, frame_body, 0)

        _topk_tail(scores_buf, out_s_ref, out_i_ref, q_n, total_k, topk,
                   extract_mode, scores_dtype)

    return kernel, kbh, kbw, kb_pad, total_k, q_n, kb_n


@functools.partial(
    jax.jit,
    static_argnames=('radius', 'temperature', 'topk', 'tile', 'h', 'w',
                     'interpret', 'extract_mode', 'scores_dtype',
                     'fetch_mode', 'matmul_precision', 'store_mode',
                     'matmul_mode', 'group_frames'))
def pallas_local_topk_attend(query_padded: jnp.ndarray,
                             bank_feats: jnp.ndarray,
                             bank_vals: jnp.ndarray,
                             bank_valid: jnp.ndarray,
                             radius: float,
                             temperature: float,
                             topk: int,
                             h: int,
                             w: int,
                             tile: Tuple[int, int] = (8, 8),
                             interpret: bool = False,
                             extract_mode: str = 'mask',
                             scores_dtype: str = 'float32',
                             fetch_mode: str = 'perframe',
                             matmul_precision: str = 'float32',
                             store_mode: str = 'concat',
                             matmul_mode: str = 'perframe',
                             group_frames=None) -> jnp.ndarray:
    """Fused masked top-k attention over one query frame.

    Args:
        query_padded: (Hp+2r, Wp+2rw, C) — query frame in the padded layout
            (r rows top/bottom, rw = round_up(r, 8) cols left/right; use
            ``pad_for_pallas``), pre-normalized.
        bank_feats: (F, Hp+2r, Wp+2rw, C) pre-normalized, padded.
        bank_vals: (F, h, w, K) — UN-padded values (gathered in the XLA
            epilogue).
        bank_valid: (F,) bool/int.
        h, w: un-padded spatial size.
        scores_dtype: 'float32' (exact, default) or 'bfloat16' — bf16
            halves the bytes the k top-k passes sweep through VMEM at the
            cost of score rounding (ties resolve to the lowest flat index
            either way; see PROGRESS for the measured A/B).
        matmul_precision: 'float32' (exact: 6-pass bf16 MXU emulation,
            default) or 'bfloat16' — casts query/key features to bf16 so
            the QK^T runs as ONE native MXU pass with an fp32 accumulator
            (key DMA + VMEM bytes halve too). Scores and the top-k
            extraction stay fp32; only the inputs round.
        matmul_mode: 'perframe' (one small dot per bank frame, original)
            or 'batched' — one MXU matmul per GROUP of frames with
            mask+validity applied as a single batched add (kills the
            measured ~0.25 ms/bank-frame fixed overhead). Requires the
            inputs padded with ``pad_for_pallas(..., matmul_mode=
            'batched')``. Exact same results either way.
        group_frames: frames per matmul group in batched mode (None =
            auto from the VMEM budget; r18-sized banks score all F
            frames in one matmul).
    Returns:
        (h, w, K) propagated logits.
    """
    if extract_mode not in ('mask', 'descent', 'packed'):
        raise ValueError(f"extract_mode must be 'mask', 'descent' or "
                         f"'packed', got {extract_mode!r}")
    if scores_dtype not in ('float32', 'bfloat16'):
        raise ValueError(f"scores_dtype must be 'float32' or 'bfloat16', "
                         f"got {scores_dtype!r}")
    if fetch_mode not in ('perframe', 'whole'):
        raise ValueError(f"fetch_mode must be 'perframe' or 'whole', got "
                         f"{fetch_mode!r}")
    if matmul_precision not in ('float32', 'bfloat16'):
        raise ValueError(f"matmul_precision must be 'float32' or "
                         f"'bfloat16', got {matmul_precision!r}")
    if matmul_mode not in ('perframe', 'batched'):
        raise ValueError(f"matmul_mode must be 'perframe' or 'batched', "
                         f"got {matmul_mode!r}")
    s_dtype = jnp.dtype(scores_dtype)
    if extract_mode == 'packed':
        if matmul_mode != 'perframe' or store_mode != 'concat' \
                or scores_dtype != 'float32':
            raise ValueError("extract_mode='packed' requires "
                             "matmul_mode='perframe', store_mode='concat' "
                             "and scores_dtype='float32'")
        s_dtype = jnp.dtype(jnp.int32)  # (quantized score, col) packed
    feat_dtype = jnp.dtype(jnp.bfloat16) if matmul_precision == 'bfloat16' \
        else jnp.dtype(jnp.float32)
    query_padded = query_padded.astype(feat_dtype)
    bank_feats = bank_feats.astype(feat_dtype)
    th, tw = tile
    r = int(math.ceil(radius - 1))
    rw = _round_up(r, 8)
    f_frames = bank_feats.shape[0]
    c = bank_feats.shape[-1]
    k_classes = bank_vals.shape[-1]
    nth = -(-h // th)
    ntw = -(-w // tw)

    if matmul_mode == 'batched':
        kbh, kbw, _ = _batched_geometry(th, tw, r, rw)
        # auto group size: the whole bank in ONE matmul when its key
        # blocks fit the VMEM budget single-buffered, else the largest
        # double-buffered group that does
        frame_bytes = kbh * kbw * c * feat_dtype.itemsize
        budget = 40 * 1024 * 1024
        if group_frames is None:
            if f_frames * frame_bytes <= budget:
                g_frames = f_frames
            else:
                g_frames = max(1, int(budget // (2 * frame_bytes)))
        else:
            g_frames = min(int(group_frames), f_frames)
        kernel, kbh, kbw, kb_n, total_k, q_n, n_slots = \
            _make_kernel_batched(
                th, tw, r, rw, float(radius), h, w, c, f_frames, topk,
                float(temperature), extract_mode, scores_dtype=s_dtype,
                feat_dtype=feat_dtype, group_frames=g_frames)
        seg = kb_n                       # frame segments self-aligned
        key_buf_shape = (n_slots, g_frames, kbh, kbw, c)
        mask_cols = kb_n                 # already a 128-multiple
        sem_k_slots = n_slots
    else:
        kernel, kbh, kbw, kb_pad, total_k, q_n, kb_n = _make_kernel(
            th, tw, r, rw, float(radius), h, w, c, f_frames, topk,
            float(temperature), extract_mode, scores_dtype=s_dtype,
            fetch_mode=fetch_mode, feat_dtype=feat_dtype,
            store_mode=store_mode)
        if extract_mode == 'packed' and total_k > 65536:
            raise ValueError(
                f"extract_mode='packed' packs the flat key index into 16 "
                f"bits; total_k={total_k} > 65536 (use 'mask')")
        seg = kb_pad
        key_buf_shape = (f_frames if fetch_mode == 'whole' else 2,
                         kbh, kbw, c)
        mask_cols = kb_pad
        sem_k_slots = 2

    # precomputed per-tile additive mask (nth, ntw, q_n, kb_n)
    qi, qj = jnp.divmod(jnp.arange(q_n), tw)
    ka, kb2 = jnp.divmod(jnp.arange(kb_n), kbw)
    dy = (ka[None, :] - r) - qi[:, None]
    dx = (kb2[None, :] - rw) - qj[:, None]
    circle = (dy.astype(jnp.float32)**2 +
              dx.astype(jnp.float32)**2) < radius * radius
    oy = (jnp.arange(nth) * th)[:, None, None, None]
    ox = (jnp.arange(ntw) * tw)[None, :, None, None]
    aky = ka[None, None, None, :] + oy - r
    akx = kb2[None, None, None, :] + ox - rw
    inb = (aky >= 0) & (aky < h) & (akx >= 0) & (akx < w)
    qin = ((qi[None, None, :, None] + oy) < h) & \
        ((qj[None, None, :, None] + ox) < w)
    mask4 = jnp.where(circle[None, None] & inb & qin, 0.0,
                      NEG_INF).astype(jnp.float32)
    # pad the mask's last dim to the 128-aligned kb_pad (Mosaic DMA slice
    # alignment); the kernel reads the first kb_n columns. In batched
    # mode kb_n is 128-aligned by construction — no padding.
    if mask_cols > kb_n:
        mask4 = jnp.pad(mask4, ((0, 0), (0, 0), (0, 0),
                                (0, mask_cols - kb_n)),
                        constant_values=NEG_INF)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nth, ntw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # query (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # bank feats (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # per-tile mask (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, q_n, topk), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_n, topk), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((th, tw, c), feat_dtype),          # q_buf
            pltpu.VMEM(key_buf_shape, feat_dtype),        # key_buf
            pltpu.VMEM((q_n, total_k), s_dtype),          # scores
            pltpu.VMEM((q_n, mask_cols), jnp.float32),    # mask
            pltpu.SemaphoreType.DMA(()),                  # sem_q
            pltpu.SemaphoreType.DMA((sem_k_slots,)),      # sem_k
            pltpu.SemaphoreType.DMA(()),                  # sem_m
        ],
    )
    top_s, top_i = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nth, ntw, q_n, topk), jnp.float32),
            jax.ShapeDtypeStruct((nth, ntw, q_n, topk), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bank_valid.astype(jnp.int32), query_padded, bank_feats, mask4)

    # ---- XLA epilogue: decode flat indices, gather values, softmax ----
    f_idx = top_i // seg
    rem = top_i % seg
    a = rem // kbw
    b = rem % kbw
    ty = jnp.arange(nth)[:, None, None, None] * th
    tx = jnp.arange(ntw)[None, :, None, None] * tw
    y = jnp.clip(ty + a - r, 0, h - 1)
    x = jnp.clip(tx + b - rw, 0, w - 1)
    f_idx = jnp.clip(f_idx, 0, f_frames - 1)
    vals = bank_vals[f_idx, y, x]                       # (nth,ntw,Q,k,K)
    if extract_mode == 'packed':
        # the kernel selected by 16-bit-quantized scores and returned
        # indices only; recompute the exact scores for the softmax by
        # re-dotting each query with its k selected keys (tiny: Q*k
        # length-C dots per tile)
        qq = jnp.arange(q_n)
        qy = jnp.clip(ty + (qq // tw)[None, None, :, None], 0, h - 1)
        qx = jnp.clip(tx + (qq % tw)[None, None, :, None], 0, w - 1)
        q_sel = query_padded[qy + r, qx + rw]           # (nth,ntw,Q,1,C)
        k_sel = bank_feats[f_idx, y + r, x + rw]        # (nth,ntw,Q,k,C)
        top_s = jnp.einsum(
            'abqoc,abqkc->abqk', q_sel, k_sel,
            precision=(lax.Precision.DEFAULT
                       if feat_dtype == jnp.bfloat16
                       else lax.Precision.HIGHEST),
            preferred_element_type=jnp.float32) * (1.0 / temperature)
    weights = jax.nn.softmax(top_s, axis=-1)
    out = jnp.einsum('abqk,abqkc->abqc', weights, vals,
                     preferred_element_type=jnp.float32)
    out = out.reshape(nth, ntw, th, tw, k_classes)
    out = jnp.moveaxis(out, 2, 1).reshape(nth * th, ntw * tw, k_classes)
    return out[:h, :w]


def pad_for_pallas(x: jnp.ndarray, h: int, w: int, radius: float,
                   tile: Tuple[int, int],
                   matmul_mode: str = 'perframe') -> jnp.ndarray:
    """Pad ``(..., h, w, C)`` into the kernel layout: r rows top/bottom
    (plus tile remainder at the bottom), rw = round_up(r, 8) cols
    left/right (plus tile remainder at the right). ``matmul_mode=
    'batched'`` adds the lane-alignment rows the batched kernel's taller
    key blocks read below the last tile row (see _batched_geometry)."""
    th, tw = tile
    r = int(math.ceil(radius - 1))
    rw = _round_up(r, 8)
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    dh = _batched_geometry(th, tw, r, rw)[2] \
        if matmul_mode == 'batched' else 0
    pads = [(0, 0)] * x.ndim
    pads[x.ndim - 3] = (r, r + hp - h + dh)
    pads[x.ndim - 2] = (rw, rw + wp - w)
    return jnp.pad(x, pads)
