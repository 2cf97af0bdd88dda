"""Whole-video fused affinity kernel: the round-4 propagation redesign.

The scan-based kernels (pallas_attention.py v1/v2) hit two measured walls
on TPU v5e (PROGRESS r2-r3, BENCH_r03):

  1. **Key-block DMA refetch** — every scan step re-fetches the dilated
     key block of all 21 bank frames per query tile (~2.9 GB/frame at r18
     shapes ≈ 3.5 ms/frame of HBM traffic);
  2. **Top-k extraction sweeps** — k dependent full-buffer reduction
     passes per query frame (~0.37 ms/pass, VPU-bound).

Both fall to the same observation (VERDICT r3 #1): the top-k *selection*
depends only on features, never on the propagated labels, so the frame
loop needs no sequential dependency at all. This kernel therefore runs
per spatial tile over the WHOLE video:

  - a ring of ``precede_frames + 2`` dilated key blocks stays **resident
    in VMEM**; each frame's block is fetched from HBM exactly once per
    tile (the 21x refetch disappears — frame t's block arrives while
    frame t-1 is being processed and serves queries t+1..t+P as keys and
    frame t as queries, its center rows/cols);
  - per query frame t the bank is processed per-frame (matmul -> passes
    -> lexicographic candidate merge) with a **tau early exit**: once a
    frame's remaining row-max falls below every query's current 10th-best
    score, the rest of its passes provably cannot contribute a candidate
    and are skipped (exact: a skipped pass's best value is <= the current
    pass max, which is already < tau rowwise; ties continue on >=, and
    the merge resolves (value desc, flat-index asc) like torch.topk).
    Bank frames are visited most-recent-first so tau tightens fast;
  - it returns ``(top_scores, top_flat_idx)`` per (tile, frame, query).
    The value gather — the only truly sequential part, ``seg[idx]`` at
    ~10 topk x K MACs per query — runs as a trivial ``lax.scan`` in the
    XLA epilogue (see propagation._propagate_video_decoupled).

Candidate order parity: bank position 0 = the prepended first frame,
positions 1..P = ring slot semantics of the scan engine (slot j holds the
latest frame f < t with f % P == j-1), so flat-index tie-breaks match the
tiled/v1 tiers bit-for-bit, including the reference's frame-0 duplication
while t <= P (reference: mmaction/models/trackers/vanilla_tracker.py:
132-160 + local_attention.py:314-334).

Geometry: key blocks are fetched at the tile origin in a layout padded by
exactly ``r`` (left/top), so W offsets stay 8-aligned without the v1
layout's round_up(r, 8) overfetch; block height is rounded up so each
block is a whole number of 128-lane groups (kb % 128 == 0 — no pad-lane
bookkeeping anywhere; the circle mask kills the extra rows).
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
BIG_IDX = 2**30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _row_max_and_first(s, col, fill, pass_mode):
    """One top-k extraction pass: row max + index of its FIRST
    occurrence (torch.topk tie order).

    'maxfirst' (default): max reduce, then argmin-of-where — the where
    depends on the max, so the pass is three dependent full traversals
    (max; compare+select+min; mask-store by the caller).
    'argmax': ``jnp.argmax`` + ``jnp.max`` are INDEPENDENT reductions
    over the same loaded values, so the compiler may fuse them into one
    traversal — two traversals per pass instead of three. Exact either
    way (argmax also returns the first occurrence on ties)."""
    if pass_mode == 'argmax':
        first = jnp.argmax(s, axis=1).astype(jnp.int32)[:, None]
        m = jnp.max(s, axis=1, keepdims=True)
        return m, first
    m = jnp.max(s, axis=1, keepdims=True)
    first = jnp.min(jnp.where(s >= m, col, fill), axis=1, keepdims=True)
    return m, first


def video_kernel_geometry(h: int, w: int, radius: float,
                          tile: Tuple[int, int]):
    """Static geometry shared by the kernel, the padding helper and the
    index decode. Returns a dict of ints."""
    th, tw = tile
    r = int(math.ceil(radius - 1))  # max integer offset with dist < radius
    nth = -(-h // th)
    ntw = -(-w // tw)
    tws = _round_up(tw + 2 * r, 8)          # fetched block width
    kbh = th + 2 * r                        # fetched block height (exact)
    kb = kbh * tws
    kb_cap = _round_up(kb, 128)             # segment stride in the sweep
    # compact layout (v2): a query at tile row qi only has in-circle keys
    # in block rows [qi, qi + 2r]; shifting each qi row group's store by
    # qi*tws packs every query row's valid band to lanes [0, vr*tws)
    vr = 2 * r + 1                          # valid block rows per query
    cap_c = _round_up(vr * tws, 128)        # compact segment stride
    return dict(th=th, tw=tw, r=r, nth=nth, ntw=ntw, tws=tws, kbh=kbh,
                kb=kb, kb_cap=kb_cap, vr=vr, cap_c=cap_c)


def pad_for_video_kernel(x: jnp.ndarray, h: int, w: int, radius: float,
                         tile: Tuple[int, int]) -> jnp.ndarray:
    """Pad ``(T, h, w, C)`` to the kernel fetch layout: ``r`` rows/cols of
    zeros at top/left; bottom/right sized so the last tile's
    (kbh, tws) block fetch stays in bounds."""
    g = video_kernel_geometry(h, w, radius, tile)
    bottom = (g['nth'] - 1) * g['th'] + g['kbh'] - g['r'] - h
    right = (g['ntw'] - 1) * g['tw'] + g['tws'] - g['r'] - w
    return jnp.pad(x, ((0, 0), (g['r'], bottom), (g['r'], right), (0, 0)))


def _make_video_kernel(g, c, t_total, p_frames, topk, temperature,
                       feat_dtype, early_exit, extract, sweep_rows=1,
                       pass_mode='maxfirst'):
    th, tw, r = g['th'], g['tw'], g['r']
    tws, kbh, kb, kb_cap = g['tws'], g['kbh'], g['kb'], g['kb_cap']
    q_n = th * tw
    ring_n = p_frames + 2
    total_k = (p_frames + 1) * kb_cap
    inv_tau = 1.0 / temperature
    exact = feat_dtype != jnp.bfloat16

    def kernel(feats_ref, mask_ref, out_s_ref, out_i_ref,
               ring, first_buf, mask_buf, sbuf, cand_s, cand_i, fcand_s,
               fcand_i, flag_ref, sem_ring, sem_first, sem_m):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        oy = ti * th
        ox = tj * tw

        def fetch(f, buf, sem):
            return pltpu.make_async_copy(
                feats_ref.at[f, pl.ds(oy, kbh), pl.ds(ox, tws), :],
                buf, sem)

        def ring_fetch(f):
            slot = lax.rem(f, ring_n)
            return fetch(f, ring.at[slot], sem_ring.at[slot])

        # prologue: first frame (persistent) + frames 0 and 1 into the ring
        cp_m = pltpu.make_async_copy(mask_ref.at[ti, tj], mask_buf, sem_m)
        cp_m.start()
        fetch(0, first_buf, sem_first).start()
        ring_fetch(0).start()
        if t_total >= 2:
            ring_fetch(1).start()
        fetch(0, first_buf, sem_first).wait()
        ring_fetch(0).wait()
        cp_m.wait()
        col = lax.broadcasted_iota(jnp.int32, (q_n, kb), 1)

        def matmul(q, block):
            keys = block.reshape(kb, c)
            s = lax.dot_general(
                q, keys, (((1,), (1,)), ((), ())),
                precision=(lax.Precision.HIGHEST if exact
                           else lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32) * inv_tau
            return s + (mask_buf[:] if kb == kb_cap
                        else mask_buf[:, :kb])

        def extract_passes(scores, base):
            """Frame-local top-k with tau early exit. ``scores`` is a
            value (registers); masked-out state round-trips through
            ``sbuf`` only when a next pass actually runs."""
            tau = cand_s[:, topk - 1:topk]               # (q_n, 1)
            m = jnp.max(scores, axis=1, keepdims=True)
            first = jnp.min(jnp.where(scores >= m, col, kb), axis=1,
                            keepdims=True)
            fcand_s[:, 0:1] = m
            fcand_i[:, 0:1] = first + base
            if topk == 1:
                return
            cont = jnp.any(m >= tau)
            if early_exit:
                flag_ref[0, 0] = cont.astype(jnp.int32)

                @pl.when(cont)
                def _():
                    sbuf[:] = jnp.where(col == first, NEG_INF, scores)
            else:
                sbuf[:] = jnp.where(col == first, NEG_INF, scores)

            for p in range(1, topk):
                def body(p=p):
                    s = sbuf[:]
                    m = jnp.max(s, axis=1, keepdims=True)
                    first = jnp.min(jnp.where(s >= m, col, kb), axis=1,
                                    keepdims=True)
                    fcand_s[:, p:p + 1] = m
                    fcand_i[:, p:p + 1] = first + base
                    if p + 1 == topk:
                        return
                    if early_exit:
                        nxt = jnp.any(m >= tau)
                        flag_ref[0, 0] = nxt.astype(jnp.int32)

                        @pl.when(nxt)
                        def _():
                            sbuf[:] = jnp.where(col == first, NEG_INF, s)
                    else:
                        sbuf[:] = jnp.where(col == first, NEG_INF, s)

                if early_exit:
                    @pl.when(flag_ref[0, 0] == 1)
                    def _(body=body):
                        body()
                else:
                    body()

        def merge():
            """Fold the frame candidates into the running top-k:
            lexicographic (value desc, flat idx asc) — torch.topk ties."""
            cs = jnp.concatenate([cand_s[:], fcand_s[:]], axis=1)
            ci = jnp.concatenate([cand_i[:], fcand_i[:]], axis=1)
            ns, ni = [], []
            for p in range(topk):
                m = jnp.max(cs, axis=1, keepdims=True)
                eq = cs >= m
                gidx = jnp.min(jnp.where(eq, ci, BIG_IDX), axis=1,
                               keepdims=True)
                ns.append(m)
                ni.append(gidx)
                if p + 1 < topk:
                    cs = jnp.where(eq & (ci == gidx), NEG_INF, cs)
            cand_s[:] = jnp.concatenate(ns, axis=1)
            cand_i[:] = jnp.concatenate(ni, axis=1)

        def process_frame(q, block, j_bank):
            scores = matmul(q, block)
            # NEG_INF-init the frame buffers so skipped passes stay inert
            fcand_s[:] = jnp.full((q_n, topk), NEG_INF, jnp.float32)
            fcand_i[:] = jnp.full((q_n, topk), BIG_IDX, jnp.int32)
            extract_passes(scores, j_bank * kb_cap)
            if early_exit:
                tau = cand_s[:, topk - 1:topk]

                @pl.when(jnp.any(fcand_s[:, 0:1] >= tau))
                def _():
                    merge()
            else:
                merge()

        def frames_of(t, body):
            """Visit the bank of frame t: most-recent-first (f = t-1, the
            prepended first frame, then t-2..t-P — fast tau tightening in
            'perframe' mode; order-independent results either way).
            ``body(q_block, j_bank, conditional)``."""
            for o in range(p_frames + 1):
                if o == 1:
                    body(first_buf[:], 0, None)
                    continue
                f = t - 1 if o == 0 else t - o
                j_bank = 1 + lax.rem(f, p_frames)
                if o < 2:
                    body(ring[lax.rem(f, ring_n)][:], j_bank, None)
                else:
                    @pl.when(f >= 0)
                    def _(f=f, j_bank=j_bank):
                        body(ring[lax.rem(f, ring_n)][:], j_bank, None)

        def step_perframe(t, _):
            slot_t = lax.rem(t, ring_n)
            ring_fetch(t).wait()  # frame t arrived (queries for step t)

            @pl.when(t + 1 < t_total)
            def _():
                ring_fetch(t + 1).start()

            q = ring[slot_t][r:r + th, r:r + tw, :].reshape(q_n, c)
            cand_s[:] = jnp.full((q_n, topk), NEG_INF, jnp.float32)
            cand_i[:] = jnp.full((q_n, topk), BIG_IDX, jnp.int32)
            frames_of(t, lambda block, j_bank, _:
                      process_frame(q, block, j_bank))
            out_s_ref[0, 0, t] = cand_s[:]
            out_i_ref[0, 0, t] = cand_i[:]
            return 0

        def step_sweep(t, _):
            """v1-style extraction on the resident ring: per-frame score
            segments stored independently (they pipeline — no serial
            merge chain), then k full-width passes. Measured on v5e: the
            'perframe' merge chain is latency-bound (420 dependent
            small-vector op groups/tile/frame), this is not."""
            slot_t = lax.rem(t, ring_n)
            ring_fetch(t).wait()

            @pl.when(t + 1 < t_total)
            def _():
                ring_fetch(t + 1).start()

            q = ring[slot_t][r:r + th, r:r + tw, :].reshape(q_n, c)

            # frames < 0 leave their segment unwritten while t <= P:
            # NEG_INF-fill once (their bank slots are exactly the ones
            # no valid frame claims yet)
            @pl.when(t <= p_frames)
            def _():
                sbuf[:] = jnp.full((q_n, total_k), NEG_INF, jnp.float32)

            def score_frame(block, j_bank, _):
                s = matmul(q, block)
                if kb_cap > kb:
                    s = jnp.concatenate(
                        [s, jnp.full((q_n, kb_cap - kb), NEG_INF,
                                     jnp.float32)], axis=1)
                off = pl.multiple_of(j_bank * kb_cap, 128)
                sbuf[:, pl.ds(off, kb_cap)] = s

            frames_of(t, score_frame)

            # extraction: ``sweep_rows`` independent row groups whose
            # pass chains interleave at source order — each group's
            # pass p+1 depends only on its own pass p, so group B's
            # work hides group A's reduce->mask->store latency (exact:
            # query rows never interact in the sweep)
            rows = q_n // sweep_rows
            col = lax.broadcasted_iota(jnp.int32, (rows, total_k), 1)
            tops = [[[], []] for _ in range(sweep_rows)]
            for p in range(topk):
                for gi in range(sweep_rows):
                    r0 = gi * rows
                    s = sbuf[r0:r0 + rows, :]
                    m, first = _row_max_and_first(s, col, total_k,
                                                  pass_mode)
                    tops[gi][0].append(m)
                    tops[gi][1].append(first)
                    if p + 1 < topk:
                        sbuf[r0:r0 + rows, :] = jnp.where(
                            col == first, NEG_INF, s)
            for gi in range(sweep_rows):
                r0 = gi * rows
                out_s_ref[0, 0, t, r0:r0 + rows] = jnp.concatenate(
                    tops[gi][0], axis=1)
                out_i_ref[0, 0, t, r0:r0 + rows] = jnp.concatenate(
                    tops[gi][1], axis=1)
            return 0

        lax.fori_loop(1, t_total,
                      step_sweep if extract == 'sweep' else step_perframe,
                      0)

    return kernel, q_n, ring_n


def _make_split_kernel(g, c, t_total, p_frames, off_lo, off_hi,
                       include_first, topk, temperature, feat_dtype,
                       sweep_rows=1, pass_mode='maxfirst'):
    """Bank-split variant (sweep extraction only): one pass over the
    video covering window offsets ``d in [off_lo, off_hi]`` (keys
    ``f = t - d``), optionally plus the prepended first frame. Splitting
    the 21-frame bank into contiguous offset ranges bounds the VMEM ring
    (r50's radius-18 C=1024 blocks x 23 slots exceed v5e VMEM in one
    pass); each pass still fetches every block exactly once per tile.
    Candidate indices are emitted in the GLOBAL bank encoding
    (j * kb_cap + pos), so the per-split top-k lists merge exactly in
    XLA with a two-key lexicographic sort.

    Within-split ties between equal fp32 scores at different positions
    resolve by local segment order, which may differ from the global
    flat order when the ring wraps — value-identical duplicates (the
    frame-0 duplication) are unaffected, and distinct-position exact
    score ties do not occur on real features."""
    th, tw, r = g['th'], g['tw'], g['r']
    tws, kbh, kb, kb_cap = g['tws'], g['kbh'], g['kb'], g['kb_cap']
    q_n = th * tw
    first_seg = 1 if include_first else 0
    n_off = off_hi - off_lo + 1
    n_seg = n_off + first_seg
    ring_n = (off_hi + 2 if off_lo == 1 else n_off + 2) + 1
    total_k = n_seg * kb_cap
    inv_tau = 1.0 / temperature
    exact = feat_dtype != jnp.bfloat16
    # query sliver fetch geometry (off_lo > 1: frame t is not resident)
    qd = r % 8
    qw = _round_up(tw + qd, 8)

    def kernel(feats_ref, mask_ref, out_s_ref, out_i_ref, ring, first_buf,
               qbuf, mask_buf, sbuf, sem_ring, sem_first, sem_q, sem_m):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        oy = ti * th
        ox = tj * tw

        def fetch(f, buf, sem):
            return pltpu.make_async_copy(
                feats_ref.at[f, pl.ds(oy, kbh), pl.ds(ox, tws), :],
                buf, sem)

        def ring_fetch(f):
            slot = lax.rem(f, ring_n)
            return fetch(f, ring.at[slot], sem_ring.at[slot])

        def q_fetch(t):
            slot = lax.rem(t, 2)
            return pltpu.make_async_copy(
                feats_ref.at[t, pl.ds(oy + r, th),
                             pl.ds(ox + r - qd, qw), :],
                qbuf.at[slot], sem_q.at[slot])

        cp_m = pltpu.make_async_copy(mask_ref.at[ti, tj], mask_buf, sem_m)
        cp_m.start()
        if include_first:
            fetch(0, first_buf, sem_first).start()
        if off_lo == 1:
            ring_fetch(0).start()
            if t_total >= 2:
                ring_fetch(1).start()
            ring_fetch(0).wait()
        else:
            q_fetch(1).start()
        if include_first:
            fetch(0, first_buf, sem_first).wait()
        cp_m.wait()

        def matmul(q, block):
            keys = block.reshape(kb, c)
            s = lax.dot_general(
                q, keys, (((1,), (1,)), ((), ())),
                precision=(lax.Precision.HIGHEST if exact
                           else lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32) * inv_tau
            return s + (mask_buf[:] if kb == kb_cap
                        else mask_buf[:, :kb])

        def step(t, _):
            # ---- DMA schedule ----
            if off_lo == 1:
                ring_fetch(t).wait()          # frame t (queries + keys)

                @pl.when(t + 1 < t_total)
                def _():
                    ring_fetch(t + 1).start()
                q = ring[lax.rem(t, ring_n)][r:r + th, r:r + tw,
                                             :].reshape(q_n, c)
            else:
                f_new = t - off_lo + 1        # first used at step t+1

                @pl.when((f_new >= 0) & (f_new + off_lo <= t_total - 1))
                def _():
                    ring_fetch(f_new).start()

                @pl.when(t - off_lo >= 0)
                def _():
                    ring_fetch(t - off_lo).wait()  # first use of f
                q_fetch(t).wait()

                @pl.when(t + 1 < t_total)
                def _():
                    q_fetch(t + 1).start()
                q = qbuf[lax.rem(t, 2)][:, qd:qd + tw, :].reshape(q_n, c)

            # segments of not-yet-valid frames stay NEG_INF
            @pl.when(t < off_hi)
            def _():
                sbuf[:] = jnp.full((q_n, total_k), NEG_INF, jnp.float32)

            def score_into(block, l_seg):
                s = matmul(q, block)
                if kb_cap > kb:
                    s = jnp.concatenate(
                        [s, jnp.full((q_n, kb_cap - kb), NEG_INF,
                                     jnp.float32)], axis=1)
                sbuf[:, pl.ds(pl.multiple_of(l_seg * kb_cap, 128),
                              kb_cap)] = s

            if include_first:
                score_into(first_buf[:], 0)
            for i_off, d in enumerate(range(off_lo, off_hi + 1)):
                f = t - d
                if d == 1:
                    score_into(ring[lax.rem(f, ring_n)][:],
                               first_seg + i_off)
                else:
                    @pl.when(f >= 0)
                    def _(f=f, l=first_seg + i_off):
                        score_into(ring[lax.rem(f, ring_n)][:], l)

            # row-group-split extraction: see _make_video_kernel (the
            # groups' pass chains are independent and interleave)
            rows = q_n // sweep_rows
            col = lax.broadcasted_iota(jnp.int32, (rows, total_k), 1)
            tops = [[[], []] for _ in range(sweep_rows)]
            for p in range(topk):
                for gi in range(sweep_rows):
                    r0 = gi * rows
                    s = sbuf[r0:r0 + rows, :]
                    m, first = _row_max_and_first(s, col, total_k,
                                                  pass_mode)
                    tops[gi][0].append(m)
                    tops[gi][1].append(first)
                    if p + 1 < topk:
                        sbuf[r0:r0 + rows, :] = jnp.where(
                            col == first, NEG_INF, s)
            for gi in range(sweep_rows):
                r0 = gi * rows
                loc_i = jnp.concatenate(tops[gi][1], axis=1)  # (rows, k)
                # local segment index -> GLOBAL bank position j so
                # splits merge in one shared encoding
                l_seg = loc_i // kb_cap
                pos = loc_i % kb_cap
                d_vec = off_lo + l_seg - first_seg
                f_vec = t - d_vec
                j_glob = 1 + lax.rem(f_vec + p_frames * 8, p_frames)
                if include_first:
                    j_glob = jnp.where(l_seg == 0, 0, j_glob)
                out_s_ref[0, 0, t, r0:r0 + rows] = jnp.concatenate(
                    tops[gi][0], axis=1)
                out_i_ref[0, 0, t, r0:r0 + rows] = j_glob * kb_cap + pos
            return 0

        lax.fori_loop(1, t_total, step, 0)

    return kernel, q_n, ring_n, n_seg, qw


@functools.partial(
    jax.jit,
    static_argnames=('radius', 'temperature', 'topk', 'precede_frames',
                     'h', 'w', 'tile', 'interpret', 'early_exit',
                     'extract', 'bank_splits', 'sweep_rows', 'pass_mode'))
def video_topk_affinity(feats_pad: jnp.ndarray,
                        radius: float,
                        temperature: float,
                        topk: int,
                        precede_frames: int,
                        h: int,
                        w: int,
                        tile: Tuple[int, int] = (8, 8),
                        interpret: bool = False,
                        early_exit: bool = True,
                        extract: str = 'sweep',
                        bank_splits: int = 1,
                        sweep_rows: int = 1,
                        pass_mode: str = 'maxfirst'):
    """Merged masked top-k affinity of every frame against its bank.

    Args:
        feats_pad: (T, Hp, Wp, C) pre-normalized features in the
            ``pad_for_video_kernel`` layout (fp32 exact, or bf16 for the
            single-pass MXU path).
    Returns:
        top_s (nth, ntw, T, q_n, topk) float32 — merged top-k scores
            (frame 0 row is unwritten garbage; callers start at t=1);
        top_i (nth, ntw, T, q_n, topk) int32 — flat candidate index
            ``bank_pos * kb_cap + block_row * tws + block_col`` (decode
            with ``video_kernel_geometry``).
    """
    if extract not in ('sweep', 'perframe'):
        raise ValueError(f"extract must be 'sweep' or 'perframe', "
                         f"got {extract!r}")
    if bank_splits > 1 and extract != 'sweep':
        raise ValueError("bank_splits > 1 requires extract='sweep'")
    t_total = feats_pad.shape[0]
    c = feats_pad.shape[-1]
    g = video_kernel_geometry(h, w, radius, tile)
    feat_dtype = feats_pad.dtype
    nth, ntw, kbh, tws, kb, r, th, tw = (
        g['nth'], g['ntw'], g['kbh'], g['tws'], g['kb'], g['r'], g['th'],
        g['tw'])
    q_n = th * tw

    # per-tile additive mask: circle + key-in-bounds + query-in-bounds
    qi, qj = jnp.divmod(jnp.arange(q_n), tw)
    ka, kb2 = jnp.divmod(jnp.arange(kb), tws)
    dy = (ka[None, :] - r) - qi[:, None]
    dx = (kb2[None, :] - r) - qj[:, None]
    circle = (dy.astype(jnp.float32)**2 +
              dx.astype(jnp.float32)**2) < radius * radius
    oy = (jnp.arange(nth) * th)[:, None, None, None]
    ox = (jnp.arange(ntw) * tw)[None, :, None, None]
    aky = ka[None, None, None, :] + oy - r
    akx = kb2[None, None, None, :] + ox - r
    inb = (aky >= 0) & (aky < h) & (akx >= 0) & (akx < w)
    qin = ((qi[None, None, :, None] + oy) < h) & \
        ((qj[None, None, :, None] + ox) < w)
    mask4 = jnp.where(circle[None, None] & inb & qin, 0.0,
                      NEG_INF).astype(jnp.float32)
    if g['kb_cap'] > kb:
        # HBM DMA slices must be 128-aligned on the lane dim — pad the
        # per-tile mask to the segment stride (extra lanes NEG_INF)
        mask4 = jnp.pad(mask4, ((0, 0), (0, 0), (0, 0),
                                (0, g['kb_cap'] - kb)),
                        constant_values=NEG_INF)

    out_shape = [
        jax.ShapeDtypeStruct((nth, ntw, t_total, q_n, topk), jnp.float32),
        jax.ShapeDtypeStruct((nth, ntw, t_total, q_n, topk), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, t_total, q_n, topk),
                     lambda i, j: (i, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, t_total, q_n, topk),
                     lambda i, j: (i, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # feats (HBM)
        pl.BlockSpec(memory_space=pl.ANY),   # per-tile mask (HBM)
    ]
    out_bytes = 2 * 2 * t_total * q_n * _round_up(topk, 128) * 4

    if bank_splits <= 1:
        kernel, q_n_, ring_n = _make_video_kernel(
            g, c, t_total, int(precede_frames), topk, float(temperature),
            feat_dtype, early_exit, extract, sweep_rows, pass_mode)
        grid_spec = pl.GridSpec(
            grid=(nth, ntw), in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((ring_n, kbh, tws, c), feat_dtype),  # ring
                pltpu.VMEM((kbh, tws, c), feat_dtype),       # first_buf
                pltpu.VMEM((q_n, g['kb_cap']), jnp.float32),  # mask
                pltpu.VMEM((q_n, (precede_frames + 1) * g['kb_cap']
                            if extract == 'sweep' else kb),
                           jnp.float32),                      # sbuf
                pltpu.VMEM((q_n, topk), jnp.float32),         # cand_s
                pltpu.VMEM((q_n, topk), jnp.int32),           # cand_i
                pltpu.VMEM((q_n, topk), jnp.float32),         # fcand_s
                pltpu.VMEM((q_n, topk), jnp.int32),           # fcand_i
                pltpu.SMEM((1, 1), jnp.int32),                # flag
                pltpu.SemaphoreType.DMA((ring_n,)),           # sem_ring
                pltpu.SemaphoreType.DMA(()),                  # sem_first
                pltpu.SemaphoreType.DMA(()),                  # sem_m
            ],
        )
        ring_bytes = (ring_n + 1) * kbh * tws * c * feat_dtype.itemsize
        sbuf_bytes = q_n * ((precede_frames + 1) * g['kb_cap']
                            if extract == 'sweep' else kb) * 4
        vmem_limit = min(ring_bytes + out_bytes + 2 * sbuf_bytes +
                         q_n * kb * 4 + 12 * 1024 * 1024,
                         122 * 1024 * 1024)
        top_s, top_i = pl.pallas_call(
            kernel, out_shape=out_shape, grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
        )(feats_pad, mask4)
        return top_s, top_i

    # ---- bank-split path: one pass per contiguous offset range ----
    p = int(precede_frames)
    bounds = [1 + (p * s) // bank_splits for s in range(bank_splits + 1)]
    parts_s, parts_i = [], []
    for s in range(bank_splits):
        off_lo, off_hi = bounds[s], bounds[s + 1] - 1
        if off_hi < off_lo:
            continue
        include_first = s == 0
        kernel, q_n_, ring_n, n_seg, qw = _make_split_kernel(
            g, c, t_total, p, off_lo, off_hi, include_first, topk,
            float(temperature), feat_dtype, sweep_rows, pass_mode)
        grid_spec = pl.GridSpec(
            grid=(nth, ntw), in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((ring_n, kbh, tws, c), feat_dtype),  # ring
                pltpu.VMEM((kbh, tws, c), feat_dtype),       # first_buf
                pltpu.VMEM((2, th, qw, c), feat_dtype),      # qbuf
                pltpu.VMEM((q_n, g['kb_cap']), jnp.float32),  # mask
                pltpu.VMEM((q_n, n_seg * g['kb_cap']),
                           jnp.float32),                      # sbuf
                pltpu.SemaphoreType.DMA((ring_n,)),           # sem_ring
                pltpu.SemaphoreType.DMA(()),                  # sem_first
                pltpu.SemaphoreType.DMA((2,)),                # sem_q
                pltpu.SemaphoreType.DMA(()),                  # sem_m
            ],
        )
        ring_bytes = (ring_n + 1) * kbh * tws * c * feat_dtype.itemsize
        vmem_limit = min(ring_bytes + out_bytes +
                         2 * q_n * n_seg * g['kb_cap'] * 4 +
                         q_n * kb * 4 + 12 * 1024 * 1024,
                         122 * 1024 * 1024)
        ts, ti = pl.pallas_call(
            kernel, out_shape=out_shape, grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
        )(feats_pad, mask4)
        parts_s.append(ts)
        parts_i.append(ti)

    # exact lexicographic merge: sort by (-score, global flat idx) —
    # torch.topk's tie rule — and keep the first topk
    neg = jnp.concatenate([-s for s in parts_s], axis=-1)
    idx = jnp.concatenate(parts_i, axis=-1)
    neg_sorted, idx_sorted = jax.lax.sort((neg, idx), dimension=-1,
                                          num_keys=2)
    return -neg_sorted[..., :topk], idx_sorted[..., :topk]


# ---------------------------------------------------------------------------
# v2 kernel (round 5): query-frame pairing + qi-compact stores + compact
# transposed outputs.
#
# Three measured inefficiencies of the round-4 kernels fall together:
#
#   1. **MXU row waste** — every QK^T ran at M = q_n = 64 rows, half the
#      128-row systolic array. v2 processes ``qpair`` consecutive query
#      frames per step (M = qpair*q_n = 128): their key windows overlap in
#      all but the two boundary offsets, so the bank segments are shared
#      and only the newest/oldest segment needs a per-half NEG_INF fill.
#      The ring-slot index encoding stays exact per half: a bank slot j
#      is ambiguous between key frames t and t-P only at the two boundary
#      offsets, which are exactly the masked ones.
#   2. **Mask-dead sweep lanes** — a query at tile row qi only has
#      in-circle keys in block rows [qi, qi+2r] (vr = 2r+1 of kbh =
#      th+2r). Storing each qi row group's scores shifted left by qi*tws
#      packs every row's valid band into lanes [0, vr*tws): the top-k
#      passes sweep cap_c = round_up(vr*tws, 128) lanes per segment
#      instead of kb_cap (r18 1024 -> 768, r50 2048 -> 1792). Exact: the
#      shift is order-isomorphic per row ((a_rel, b) <-> (a, b) for fixed
#      qi), so scores, indices and tie order are unchanged.
#   3. **Output VMEM waste** — (..., q_n, topk) blocks pad topk=10 to 128
#      lanes (12.8x). v2 emits (..., topk, q_n): the freed ~10 MB is what
#      lets r50's full 22-slot ring fit in VMEM in ONE pass
#      (bank_splits=1), killing the round-4 2x bank refetch.
#
# Also evaluated and rejected (VERDICT r4 #1's specific suggestion):
# channel-chunked QK^T accumulation cannot reduce the ring residency —
# exact scores need every channel of every bank frame resident at
# extraction time, and materializing partial scores to HBM instead costs
# q_n*(P+1)*kb_cap*4 B per (tile, frame) = 2.8x the duplicated block
# fetch it would save at r50 shapes.
# ---------------------------------------------------------------------------


def _make_video2_kernel(g, c, t_total, p_frames, off_lo, off_hi,
                        include_first, topk, temperature, feat_dtype,
                        qpair, compact):
    """One pass over the video covering window offsets [off_lo, off_hi]
    (plus optionally the prepended first frame), processing ``qpair``
    consecutive query frames per step. Emits (T, topk, q_n) blocks with
    GLOBAL bank-encoded indices (j * cap + pos)."""
    th, tw, r = g['th'], g['tw'], g['r']
    tws, kbh, kb, kb_cap = g['tws'], g['kbh'], g['kb'], g['kb_cap']
    vr = g['vr']
    cap = g['cap_c'] if compact else kb_cap
    seg_w = vr * tws if compact else kb
    q_n = th * tw
    rows = qpair * q_n
    first_seg = 1 if include_first else 0
    n_off = off_hi - off_lo + 1
    n_key = n_off + (qpair - 1)
    n_seg = n_key + first_seg
    total_k = n_seg * cap
    inv_tau = 1.0 / temperature
    exact = feat_dtype != jnp.bfloat16
    full = off_lo == 1
    n_pairs = -(-(t_total - 1) // qpair)
    # ring sizing: full mode holds [t-off_hi, t+qpair-1] + qpair
    # prefetched; split mode holds the key span + 2*qpair margin
    ring_n = off_hi + 2 * qpair if full else n_off + 2 * qpair
    # query sliver fetch geometry (split mode: frame t is not resident)
    qd = r % 8
    qw = _round_up(tw + qd, 8)

    def kernel(feats_ref, mask_ref, out_s_ref, out_i_ref, ring, first_buf,
               qbuf, mask_buf, sbuf, sem_ring, sem_first, sem_q, sem_m):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        oy = ti * th
        ox = tj * tw

        def fetch(f, buf, sem):
            return pltpu.make_async_copy(
                feats_ref.at[f, pl.ds(oy, kbh), pl.ds(ox, tws), :],
                buf, sem)

        def ring_fetch(f):
            slot = lax.rem(f, ring_n)
            return fetch(f, ring.at[slot], sem_ring.at[slot])

        def q_fetch(t, i):
            # query sliver for frame t+i (clamped: the odd-tail pair
            # reads a valid frame and discards the result)
            base = lax.rem((t - 1) // qpair, 2) * qpair
            f = jnp.minimum(t + i, t_total - 1)
            return pltpu.make_async_copy(
                feats_ref.at[f, pl.ds(oy + r, th),
                             pl.ds(ox + r - qd, qw), :],
                qbuf.at[base + i], sem_q.at[base + i])

        # ---- prologue ----
        cp_m = pltpu.make_async_copy(mask_ref.at[ti, tj], mask_buf, sem_m)
        cp_m.start()
        if include_first:
            fetch(0, first_buf, sem_first).start()
        if full:
            for f0 in range(min(qpair + 1, t_total)):
                ring_fetch(f0).start()
            ring_fetch(0).wait()
        else:
            for i in range(qpair):
                f0 = 1 + i - off_lo
                if 0 <= f0 <= t_total - 1 - off_lo:
                    ring_fetch(f0).start()
                q_fetch(1, i).start()
        if include_first:
            fetch(0, first_buf, sem_first).wait()
        cp_m.wait()
        # pad lanes are NEG_INF exactly once: every live segment is
        # rewritten in full each step (plus the early-step wipe below
        # while the bank-slot -> segment mapping still has f < 0 holes)
        sbuf[:] = jnp.full((rows, total_k), NEG_INF, jnp.float32)

        def matmul(q, keys):
            s = lax.dot_general(
                q, keys, (((1,), (1,)), ((), ())),
                precision=(lax.Precision.HIGHEST if exact
                           else lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32) * inv_tau
            return s

        def step(pi, _):
            t = 1 + qpair * pi

            # ---- DMA schedule ----
            if full:
                for i in range(qpair):
                    @pl.when(t + i < t_total)
                    def _(i=i):
                        ring_fetch(t + i).wait()
                for i in range(qpair):
                    @pl.when(t + qpair + i < t_total)
                    def _(i=i):
                        ring_fetch(t + qpair + i).start()
                q_parts = [
                    ring[lax.rem(jnp.minimum(t + i, t_total - 1), ring_n)]
                    [r:r + th, r:r + tw, :].reshape(q_n, c)
                    for i in range(qpair)]
            else:
                for i in range(qpair):
                    f = t + i - off_lo

                    @pl.when((f >= 0) & (f <= t_total - 1 - off_lo))
                    def _(f=f):
                        ring_fetch(f).wait()
                for i in range(qpair):
                    f = t + qpair + i - off_lo

                    @pl.when((f >= 0) & (f <= t_total - 1 - off_lo))
                    def _(f=f):
                        ring_fetch(f).start()
                base = lax.rem(pi, 2) * qpair
                for i in range(qpair):
                    q_fetch(t, i).wait()

                @pl.when(t + qpair < t_total)
                def _():
                    for i in range(qpair):
                        q_fetch(t + qpair, i).start()
                q_parts = [qbuf[base + i][:, qd:qd + tw, :].reshape(q_n, c)
                           for i in range(qpair)]

            # ---- segment layout: sorted by GLOBAL bank slot j ----
            # The sweep's tie rule is "min physical lane among equal
            # values"; torch.topk's is "min global flat index" with the
            # bank-slot-major encoding. Laying the segments out in j
            # order makes them agree (v1's full kernel did the same
            # with a static map). Key frames W = [a, a+L) are
            # consecutive, so their j = 1 + f mod P values form a
            # contiguous arc; the rank of f in j order is
            #   u = f - a;  nw = max(0, L - (P - ms));  ms = a mod P
            #   rank(u) = u + nw            if u < P - ms   (high arc)
            #           = u - (P - ms)      otherwise       (wrapped)
            # For the full-window pair case (qpair=2, L = P+1) the two
            # colliding frames f = t (rank ms) and f = t-P (rank ms+1)
            # land adjacent, and each is NEG_INF-masked for the half
            # where it would be ambiguous — so each half sees strictly
            # j-sorted valid segments and tie order is exact.
            a_old = t - off_hi                 # oldest key frame
            ms = jnp.mod(a_old, p_frames)
            nw = jnp.maximum(0, n_key - (p_frames - ms))

            def seg_of(f):
                u = f - a_old
                return first_seg + jnp.where(u < p_frames - ms,
                                             u + nw, u - (p_frames - ms))

            # early steps: the slot -> frame mapping shifts with t, so
            # slots of still-invalid frames may hold stale scores from a
            # previous step's mapping — wipe while any f < 0 exists
            @pl.when(a_old < 0)
            def _():
                sbuf[:] = jnp.full((rows, total_k), NEG_INF, jnp.float32)

            # ---- score all segments ----
            def store_rows(s, hh, off):
                """Compact (qi-shifted) or plain store of one half's
                scores into its segment window."""
                if compact:
                    for gg in range(th):
                        r0 = gg * tw
                        sbuf[hh * q_n + r0:hh * q_n + r0 + tw,
                             pl.ds(off, seg_w)] = (
                            s[r0:r0 + tw, gg * tws:gg * tws + seg_w]
                            + mask_buf[r0:r0 + tw, :seg_w])
                else:
                    sbuf[hh * q_n:(hh + 1) * q_n, pl.ds(off, seg_w)] = (
                        s + mask_buf[:, :seg_w])

            def score_into(block, l_seg, valid):
                keys = block.reshape(kb, c)
                off = pl.multiple_of(l_seg * cap, 128)
                if all(valid):
                    s = matmul(jnp.concatenate(q_parts, axis=0)
                               if qpair > 1 else q_parts[0], keys)
                    for hh in range(qpair):
                        store_rows(s[hh * q_n:(hh + 1) * q_n], hh, off)
                    return
                for hh in range(qpair):
                    if valid[hh]:
                        store_rows(matmul(q_parts[hh], keys), hh, off)
                    else:
                        sbuf[hh * q_n:(hh + 1) * q_n,
                             pl.ds(off, seg_w)] = jnp.full(
                            (q_n, seg_w), NEG_INF, jnp.float32)

            if include_first:
                score_into(first_buf[:], 0, (True,) * qpair)
            for i_off in range(n_key):
                # key frame f = f_new - i_off; half hh (query t+hh) sees
                # it iff off_lo <= (t+hh)-f <= off_hi
                d_new = off_lo - (qpair - 1)  # offset of f_new vs t
                valid = tuple(
                    off_lo <= d_new + i_off + hh <= off_hi
                    for hh in range(qpair))
                f = t + (qpair - 1) - off_lo - i_off
                if full and i_off < qpair:
                    score_into(ring[lax.rem(f, ring_n)][:], seg_of(f),
                               valid)
                else:
                    @pl.when(f >= 0)
                    def _(f=f, valid=valid):
                        score_into(ring[lax.rem(f, ring_n)][:], seg_of(f),
                                   valid)

            # ---- k-pass extraction sweep ----
            col = lax.broadcasted_iota(jnp.int32, (rows, total_k), 1)
            tops_s, tops_i = [], []
            for p in range(topk):
                s = sbuf[:]
                m = jnp.max(s, axis=1, keepdims=True)
                first = jnp.min(jnp.where(s >= m, col, total_k), axis=1,
                                keepdims=True)
                tops_s.append(m)
                tops_i.append(first)
                if p + 1 < topk:
                    sbuf[:] = jnp.where(col == first, NEG_INF, s)

            # local segment index -> GLOBAL bank position j (ring-slot
            # encoding; exact per half because the offsets at which a
            # slot would be ambiguous are the masked boundary ones).
            # rank -> j inverts seg_of: wrapped ranks [0, nw) have
            # j-1 = rank, high ranks have j-1 = ms + rank - nw.
            loc = jnp.concatenate(tops_i, axis=1)        # (rows, topk)
            l_seg = loc // cap
            pos = loc % cap
            rank = l_seg - first_seg
            j_glob = 1 + jnp.where(rank < nw, rank, ms + rank - nw)
            if include_first:
                j_glob = jnp.where(l_seg == 0, 0, j_glob)
            gi = j_glob * cap + pos
            sc = jnp.concatenate(tops_s, axis=1)         # (rows, topk)
            sc_t = jnp.swapaxes(sc, 0, 1)                # (topk, rows)
            gi_t = jnp.swapaxes(gi, 0, 1)
            for hh in range(qpair):
                tt = t + hh

                def emit(hh=hh, tt=tt):
                    out_s_ref[0, 0, tt] = sc_t[:, hh * q_n:(hh + 1) * q_n]
                    out_i_ref[0, 0, tt] = gi_t[:, hh * q_n:(hh + 1) * q_n]

                if hh == 0:
                    emit()
                else:
                    @pl.when(tt < t_total)
                    def _(emit=emit):
                        emit()
            return 0

        lax.fori_loop(0, n_pairs, step, 0)

    return kernel, rows, ring_n, n_seg, qw


def _video2_mask(g, h, w, radius, compact):
    """Per-tile additive mask in the v2 layout: (nth, ntw, q_n, cap).

    Compact mode lane l of a row (qi, qj) addresses the absolute block
    position (a, b) = (l // tws + qi, l % tws) — the qi-shifted band."""
    th, tw, r, tws = g['th'], g['tw'], g['r'], g['tws']
    nth, ntw, kb, vr = g['nth'], g['ntw'], g['kb'], g['vr']
    cap = g['cap_c'] if compact else g['kb_cap']
    q_n = th * tw
    qi, qj = jnp.divmod(jnp.arange(q_n), tw)
    lanes = jnp.arange(vr * tws if compact else kb)
    a_lane, b = jnp.divmod(lanes, tws)
    if compact:
        a_q = a_lane[None, :] + qi[:, None]    # absolute block row
    else:
        a_q = jnp.broadcast_to(a_lane[None, :], (q_n, lanes.shape[0]))
    dy = a_q - r - qi[:, None]
    dx = b[None, :] - r - qj[:, None]
    circle = (dy.astype(jnp.float32) ** 2 +
              dx.astype(jnp.float32) ** 2) < radius * radius
    oy = (jnp.arange(nth) * th)[:, None, None, None]
    ox = (jnp.arange(ntw) * tw)[None, :, None, None]
    aky = a_q[None, None] + oy - r
    akx = b[None, None, None, :] + ox - r
    inb = (aky >= 0) & (aky < h) & (akx >= 0) & (akx < w)
    qin = ((qi[None, None, :, None] + oy) < h) & \
        ((qj[None, None, :, None] + ox) < w)
    mask4 = jnp.where(circle[None, None] & inb & qin, 0.0,
                      NEG_INF).astype(jnp.float32)
    if cap > mask4.shape[-1]:
        mask4 = jnp.pad(mask4, ((0, 0), (0, 0), (0, 0),
                                (0, cap - mask4.shape[-1])),
                        constant_values=NEG_INF)
    return mask4


@functools.partial(
    jax.jit,
    static_argnames=('radius', 'temperature', 'topk', 'precede_frames',
                     'h', 'w', 'tile', 'interpret', 'bank_splits',
                     'qpair', 'compact'))
def video_topk_affinity2(feats_pad: jnp.ndarray,
                         radius: float,
                         temperature: float,
                         topk: int,
                         precede_frames: int,
                         h: int,
                         w: int,
                         tile: Tuple[int, int] = (8, 8),
                         interpret: bool = False,
                         bank_splits: int = 1,
                         qpair: int = 2,
                         compact: bool = True):
    """v2 merged masked top-k affinity (see module section above).

    Returns:
        top_s (nth, ntw, T, topk, q_n) float32;
        top_i (nth, ntw, T, topk, q_n) int32 — flat candidate index
            ``bank_pos * cap + pos`` where in compact mode
            ``pos = a_rel * tws + b`` with the absolute block row
            ``a = a_rel + qi`` (decode with ``video_kernel_geometry``).
    """
    t_total = feats_pad.shape[0]
    c = feats_pad.shape[-1]
    g = video_kernel_geometry(h, w, radius, tile)
    feat_dtype = feats_pad.dtype
    nth, ntw, kbh, tws = g['nth'], g['ntw'], g['kbh'], g['tws']
    th, tw = g['th'], g['tw']
    q_n = th * tw
    cap = g['cap_c'] if compact else g['kb_cap']
    qpair = max(1, min(int(qpair), max(1, t_total - 1)))
    if qpair > 2:
        # the j-sorted segment layout relies on at most one bank-slot
        # collision in the window (L <= P + 1)
        raise ValueError('video_qpair must be 1 or 2')

    mask4 = _video2_mask(g, h, w, radius, compact)

    out_shape = [
        jax.ShapeDtypeStruct((nth, ntw, t_total, topk, q_n), jnp.float32),
        jax.ShapeDtypeStruct((nth, ntw, t_total, topk, q_n), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, t_total, topk, q_n),
                     lambda i, j: (i, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, t_total, topk, q_n),
                     lambda i, j: (i, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # feats (HBM)
        pl.BlockSpec(memory_space=pl.ANY),   # per-tile mask (HBM)
    ]
    out_bytes = 2 * 2 * t_total * _round_up(topk, 8) * \
        _round_up(q_n, 128) * 4

    p = int(precede_frames)
    bounds = [1 + (p * s) // bank_splits for s in range(bank_splits + 1)]
    parts_s, parts_i = [], []
    for s in range(bank_splits):
        off_lo, off_hi = bounds[s], bounds[s + 1] - 1
        if off_hi < off_lo:
            continue
        include_first = s == 0
        kernel, rows, ring_n, n_seg, qw = _make_video2_kernel(
            g, c, t_total, p, off_lo, off_hi, include_first, topk,
            float(temperature), feat_dtype, qpair, compact)
        grid_spec = pl.GridSpec(
            grid=(nth, ntw), in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((ring_n, kbh, tws, c), feat_dtype),  # ring
                pltpu.VMEM((kbh, tws, c), feat_dtype),       # first_buf
                pltpu.VMEM((2 * qpair, th, qw, c) if off_lo > 1
                           else (1, 8, 128, 1), feat_dtype),  # qbuf
                pltpu.VMEM((q_n, cap), jnp.float32),          # mask
                pltpu.VMEM((rows, n_seg * cap), jnp.float32),  # sbuf
                pltpu.SemaphoreType.DMA((ring_n,)),           # sem_ring
                pltpu.SemaphoreType.DMA(()),                  # sem_first
                pltpu.SemaphoreType.DMA((2 * qpair,)),        # sem_q
                pltpu.SemaphoreType.DMA(()),                  # sem_m
            ],
        )
        ring_bytes = (ring_n + 1) * kbh * tws * c * feat_dtype.itemsize
        vmem_limit = min(ring_bytes + out_bytes +
                         2 * rows * n_seg * cap * 4 +
                         q_n * cap * 4 + 12 * 1024 * 1024,
                         126 * 1024 * 1024)
        ts, ti = pl.pallas_call(
            kernel, out_shape=out_shape, grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
        )(feats_pad, mask4)
        parts_s.append(ts)
        parts_i.append(ti)

    if len(parts_s) == 1:
        return parts_s[0], parts_i[0]
    # exact lexicographic merge along the topk axis (now axis 3)
    neg = jnp.concatenate([-s for s in parts_s], axis=3)
    idx = jnp.concatenate(parts_i, axis=3)
    neg_sorted, idx_sorted = jax.lax.sort((neg, idx), dimension=3,
                                          num_keys=2)
    return -neg_sorted[:, :, :, :topk], idx_sorted[:, :, :, :topk]
