"""Whole-video label propagation engine (TPU-first).

Re-designs the reference's per-frame python propagation loop
(reference: mmaction/models/trackers/vanilla_tracker.py:132-160) as a single
jitted ``lax.scan`` over frames:

  - the feature/label memory bank is a **ring buffer in HBM**
    (``dynamic_update_slice`` at slot ``t % P``) instead of CPU-offloaded
    python lists (reference keeps the bank on CPU and ships it to GPU every
    frame, vanilla_tracker.py:134-139 — that host<->device ping-pong is the
    single biggest divergence point per SURVEY §3.2);
  - attention is permutation-invariant over keys, so ring-slot order never
    needs fixing up; slot validity (= how many frames are in the window yet)
    is computed from the step index;
  - top-k over the full 21-frame key set is decomposed into per-frame
    ``lax.top_k`` (lane dim H*W instead of 21*H*W) + a final merge — exact,
    and an order of magnitude faster on TPU;
  - the reference prepends the first (annotated) frame to the window
    (``with_first``, vanilla_tracker.py:140-149). NOTE the reference
    duplicates frame 0 in the key set while ``t <= precede_frames`` (it is
    both prepended and inside the window); we replicate that exactly for
    parity.

Semantics parity target: ``masked_attention_efficient`` with
``temperature=0.07, topk=10, normalize=True`` and circle mask
(test_cfg of configs/r18_nc_sgd_cos_100e_r2_1xNx8_k400.py:27-36).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .affinity import NEG_INF, l2_normalize


class PropagationConfig(NamedTuple):
    precede_frames: int = 20
    topk: int = 10
    temperature: float = 0.07
    with_first: bool = True
    with_first_neighbor: bool = True
    with_norm: bool = True
    query_chunk: int = 1284  # queries per inner step (memory bound)
    # locality fast path: when set (and with_first_neighbor), attention per
    # step runs the tiled kernel with circle radius = neighbor_range // 2
    # instead of the dense masked path (identical results; ~10x faster).
    neighbor_range: Optional[int] = None
    tile: tuple = (12, 16)  # best measured for 60x107 stride-8 DAVIS 480p
    # 'tiled' = XLA locality path; 'pallas' = fused per-frame kernel
    # (requires neighbor_range + with_first_neighbor); 'pallas_video' =
    # whole-video decoupled kernel (VMEM-resident key ring + tau-early-exit
    # top-k, value gather in a trivial scan — the round-4 redesign);
    # 'dense' = reference chunked
    backend: str = 'tiled'
    pallas_tile: tuple = (8, 8)
    # 'bfloat16' halves the bytes the kernel's top-k passes sweep
    # (speed/parity trade — see pallas_attention.pallas_local_topk_attend)
    pallas_scores: str = 'float32'
    # 'whole' fetches a tile's key blocks for ALL bank frames in one
    # strided DMA (vs per-frame double-buffered copies); exact either way
    pallas_fetch: str = 'perframe'
    # 'bfloat16' stores/feeds features in bf16: the kernel's QK^T runs
    # one native MXU pass instead of the 6-pass fp32 emulation and key
    # DMA/VMEM bytes halve; scores + top-k extraction stay fp32
    pallas_precision: str = 'float32'
    # 'memset' pre-fills the scores buffer's pad lanes once per tile and
    # stores unpadded score rows (vs re-concatenating a padded copy
    # every frame); exact either way
    pallas_store: str = 'concat'
    # 'batched' scores a whole group of bank frames per MXU matmul
    # instead of one small dot per frame (the measured per-frame fixed
    # cost); exact either way
    pallas_matmul: str = 'perframe'
    # frames per matmul group in batched mode (None = auto VMEM fit)
    pallas_group_frames: Optional[int] = None
    # top-k extraction: 'mask' (exact, default), 'descent' (exact,
    # store-free A/B reference), 'packed' (16-bit-quantized selection
    # packed with the index into one int32 — single int max per pass,
    # ~4 vs 7 VPU ops/element on the issue-bound sweep; exact scores
    # recomputed in the epilogue)
    pallas_extract: str = 'mask'
    # run the kernel in pallas interpret mode (CPU testing only)
    pallas_interpret: bool = False
    # pallas_video: skip top-k passes once a frame's remaining row-max
    # falls below every query's current 10th-best (exact; only applies to
    # video_extract='perframe'; False = A/B)
    video_early_exit: bool = True
    # pallas_video extraction: 'sweep' (per-frame score segments stored
    # independently, then k full-width passes — pipelines best) or
    # 'perframe' (immediate per-frame top-k + tau-early-exit merge —
    # latency-bound on v5e, kept as the exact A/B)
    video_extract: str = 'sweep'
    # pallas_video: number of contiguous bank splits (passes over the
    # video), each with its own VMEM key ring; None = smallest count
    # whose ring+scores fit the VMEM budget (r18: 1, r50 radius-18
    # C=1024: 2). Split top-k lists merge exactly in XLA.
    video_bank_splits: Optional[int] = None
    # pallas_video sweep extraction: number of independent query-row
    # groups whose top-k pass chains interleave (exact; >1 trades
    # nothing — it only exposes ILP across the dependent pass chains)
    video_sweep_rows: int = 1
    # per-pass reduction formulation: 'maxfirst' (max, then
    # argmin-of-where — three dependent traversals) or 'argmax'
    # (jnp.argmax + jnp.max are independent reductions over the same
    # loads — fusable into one traversal, two per pass). Exact both ways.
    video_pass_mode: str = 'maxfirst'
    # pallas_video engine: 'v2' (round 5: query-frame pairing for full
    # 128-row MXU matmuls, qi-shifted compact stores that shrink the
    # sweep width by the mask-dead band, compact transposed outputs that
    # let r50's full ring fit VMEM in one pass) or 'v1' (round 4, kept
    # as the exact A/B). All v2 transforms are exact.
    video_engine: str = 'v2'
    # v2: consecutive query frames processed per kernel step (matmul
    # rows = qpair * tile_q). Exact either way. 0 = auto: 2 when the
    # paired single-pass ring fits VMEM (r18: measured 2.85 vs 3.07
    # ms/frame), else 1 (r50: pairing measured SLOWER under bank splits,
    # 8.54 vs 8.21 — the r50 step is not MXU-row-bound and the doubled
    # score buffer costs prefetch headroom).
    video_qpair: int = 0
    # v2: qi-shifted compact score stores (sweep cap kb_cap -> cap_c)
    video_compact: bool = True


def _frame_topk(q_chunk: jnp.ndarray, feat: jnp.ndarray, seg: jnp.ndarray,
                mask_chunk: Optional[jnp.ndarray], valid: jnp.ndarray,
                temperature: float, topk: int):
    """Top-k candidates from one key frame.

    q_chunk: (Q, C) normalized queries; feat: (HW, C) normalized keys;
    seg: (HW, K) values; mask_chunk: (HW, Q) bool or None; valid: () bool.
    Returns (Q, topk) scores and (Q, topk, K) gathered values.
    """
    scores = jnp.einsum('kc,qc->qk', feat, q_chunk,
                        preferred_element_type=jnp.float32) / temperature
    if mask_chunk is not None:
        scores = jnp.where(mask_chunk.T, scores, NEG_INF)
    scores = jnp.where(valid, scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, topk)  # (Q, topk)
    top_vals = seg[top_idx]  # (Q, topk, K)
    return top_scores, top_vals


def attend_one_frame(query_feat: jnp.ndarray,
                     bank_feats: jnp.ndarray,
                     bank_segs: jnp.ndarray,
                     bank_valid: jnp.ndarray,
                     bank_masked: jnp.ndarray,
                     mask: Optional[jnp.ndarray],
                     cfg: PropagationConfig) -> jnp.ndarray:
    """Masked top-k attention of one query frame against the bank.

    Args:
        query_feat: (H, W, C).
        bank_feats: (F, H, W, C); bank_segs: (F, H, W, K).
        bank_valid: (F,) bool — whether each bank slot holds a live frame.
        bank_masked: (F,) bool — whether the spatial mask applies to the
            slot (False = the reference's ``non_mask_len`` exemption).
        mask: (HW, HW) bool [key_pos, query_pos] or None.
    Returns:
        (H, W, K) propagated logits.
    """
    f, h, w, c = bank_feats.shape
    k_classes = bank_segs.shape[-1]
    hw = h * w
    q = query_feat.reshape(hw, c)
    feats = bank_feats.reshape(f, hw, c)
    segs = bank_segs.reshape(f, hw, k_classes)
    if cfg.with_norm:
        q = l2_normalize(q, axis=-1)
        feats = l2_normalize(feats, axis=-1)

    chunk = min(cfg.query_chunk, hw)
    num_chunks = -(-hw // chunk)
    pad = num_chunks * chunk - hw
    q_pad = jnp.pad(q, ((0, pad), (0, 0))).reshape(num_chunks, chunk, c)
    if mask is not None:
        mask_pad = jnp.pad(mask, ((0, 0), (0, pad)))
        mask_chunks = jnp.moveaxis(
            mask_pad.reshape(hw, num_chunks, chunk), 1, 0)
    else:
        mask_chunks = None

    def per_chunk(args):
        q_c = args[0]
        m_c = args[1] if mask is not None else None

        def per_frame(carry, frame):
            feat_f, seg_f, valid_f, masked_f = frame
            mc = jnp.where(masked_f, m_c, True) if m_c is not None else None
            s, v = _frame_topk(q_c, feat_f, seg_f, mc, valid_f,
                               cfg.temperature, cfg.topk)
            best_s, best_v = carry
            cat_s = jnp.concatenate([best_s, s], axis=1)  # (Q, 2k)
            cat_v = jnp.concatenate([best_v, v], axis=1)  # (Q, 2k, K)
            new_s, sel = jax.lax.top_k(cat_s, cfg.topk)
            new_v = jnp.take_along_axis(cat_v, sel[..., None], axis=1)
            return (new_s, new_v), None

        init = (jnp.full((chunk, cfg.topk), NEG_INF, jnp.float32),
                jnp.zeros((chunk, cfg.topk, k_classes), jnp.float32))
        (best_s, best_v), _ = jax.lax.scan(
            per_frame, init, (feats, segs, bank_valid, bank_masked))
        weights = jax.nn.softmax(best_s, axis=-1)  # (Q, k)
        return jnp.einsum('qk,qkc->qc', weights, best_v,
                          preferred_element_type=jnp.float32)

    if mask is not None:
        outs = jax.lax.map(per_chunk, (q_pad, mask_chunks))
    else:
        outs = jax.lax.map(per_chunk, (q_pad,))
    out = outs.reshape(num_chunks * chunk, k_classes)[:hw]
    return out.reshape(h, w, k_classes)


@functools.partial(
    jax.jit,
    static_argnames=('cfg',))
def propagate_video(feats: jnp.ndarray,
                    seg_first: jnp.ndarray,
                    mask: Optional[jnp.ndarray],
                    cfg: PropagationConfig) -> jnp.ndarray:
    """Propagate a first-frame one-hot segmentation through a video.

    Args:
        feats: (T, H, W, C) per-frame backbone features (frame 0 first).
        seg_first: (H, W, K) one-hot (or soft) labels for frame 0 at
            feature resolution.
        mask: (HW, HW) bool spatial-neighborhood mask or None.
        cfg: PropagationConfig (static).

    Returns:
        (T, H, W, K) per-frame label logits; frame 0 is ``seg_first``.
    """
    t_total, h, w, c = feats.shape
    k_classes = seg_first.shape[-1]
    p = cfg.precede_frames

    use_local = (cfg.neighbor_range is not None and cfg.with_first_neighbor
                 and cfg.with_norm)
    if use_local and cfg.backend == 'pallas' and cfg.with_first:
        return _propagate_video_pallas(feats, seg_first, cfg)
    if use_local and cfg.backend == 'pallas_video' and cfg.with_first:
        return _propagate_video_decoupled(feats, seg_first, cfg)
    if use_local:
        # normalize the whole bank once; the tiled kernel assumes
        # pre-normalized features
        feats = l2_normalize(feats, axis=-1)

    first_feat = feats[0]
    ring_feat0 = jnp.zeros((p, h, w, c), feats.dtype)
    ring_seg0 = jnp.zeros((p, h, w, k_classes), jnp.float32)
    # frame 0 enters the window ring at slot 0 (0 mod P)
    ring_feat0 = ring_feat0.at[0].set(first_feat)
    ring_seg0 = ring_seg0.at[0].set(seg_first)

    # bank layout: slot 0 = prepended first frame (with_first), slots 1..P =
    # window ring. with_first_neighbor=False exempts the first slot from the
    # spatial mask (reference non_mask_len=1, vanilla_tracker.py:158-159).
    first_masked = jnp.asarray(cfg.with_first_neighbor)

    def step(carry, t):
        ring_feat, ring_seg = carry
        query = jax.lax.dynamic_index_in_dim(feats, t, 0, keepdims=False)
        if cfg.with_first:
            bank_feats = jnp.concatenate([first_feat[None], ring_feat], 0)
            bank_segs = jnp.concatenate([seg_first[None], ring_seg], 0)
            slot_valid = jnp.arange(p) < t  # ring slot j live iff j < t
            bank_valid = jnp.concatenate(
                [jnp.ones((1,), bool), slot_valid], 0)
            bank_masked = jnp.concatenate(
                [first_masked[None], jnp.ones((p,), bool)], 0)
        else:
            bank_feats, bank_segs = ring_feat, ring_seg
            bank_valid = jnp.arange(p) < t
            bank_masked = jnp.ones((p,), bool)
        if use_local:
            from .local_attention_tiled import local_masked_topk_attend
            seg_logit = local_masked_topk_attend(
                query, bank_feats, bank_segs, bank_valid,
                radius=cfg.neighbor_range // 2,
                temperature=cfg.temperature, topk=cfg.topk, tile=cfg.tile)
        else:
            seg_logit = attend_one_frame(query, bank_feats, bank_segs,
                                         bank_valid, bank_masked, mask, cfg)
        slot = jnp.mod(t, p)
        ring_feat = jax.lax.dynamic_update_index_in_dim(
            ring_feat, query, slot, 0)
        ring_seg = jax.lax.dynamic_update_index_in_dim(
            ring_seg, seg_logit, slot, 0)
        return (ring_feat, ring_seg), seg_logit

    _, seg_logits = jax.lax.scan(step, (ring_feat0, ring_seg0),
                                 jnp.arange(1, t_total))
    return jnp.concatenate([seg_first[None], seg_logits], axis=0)


def _propagate_video_pallas(feats: jnp.ndarray, seg_first: jnp.ndarray,
                            cfg: PropagationConfig) -> jnp.ndarray:
    """Pallas-backed propagation: same scan/ring-buffer semantics, the
    per-step attention runs the fused kernel. Bank slot 0 = the prepended
    first frame; slots 1..P = the window ring (frame f at slot 1 + f%P —
    attention is permutation invariant over keys)."""
    # v1 (VMEM scores buffer + batched extraction) pipelines better inside
    # the scan: A/B on TPU v5e measured 10.2 ms/frame (v1) vs 18.3 (v2,
    # per-frame extract+merge — faster standalone but its long dependency
    # chain stalls the scan). v2 stays available for single-shot use.
    from .pallas_attention import pad_for_pallas, pallas_local_topk_attend
    t_total, h, w, c = feats.shape
    k_classes = seg_first.shape[-1]
    p = cfg.precede_frames
    radius = cfg.neighbor_range // 2
    tile = cfg.pallas_tile

    feats = l2_normalize(feats, axis=-1)
    if cfg.pallas_precision == 'bfloat16':
        # bf16 bank: halves the ring-buffer update traffic in the scan
        # AND lets the kernel take the single-pass MXU path
        feats = feats.astype(jnp.bfloat16)
    feats_pad = pad_for_pallas(feats, h, w, radius, tile,
                               matmul_mode=cfg.pallas_matmul)
    hp2, wp2 = feats_pad.shape[1:3]

    bank_feats0 = jnp.zeros((p + 1, hp2, wp2, c), feats.dtype)
    bank_feats0 = bank_feats0.at[0].set(feats_pad[0])
    bank_feats0 = bank_feats0.at[1].set(feats_pad[0])  # ring slot for f=0
    bank_vals0 = jnp.zeros((p + 1, h, w, k_classes), jnp.float32)
    bank_vals0 = bank_vals0.at[0].set(seg_first)
    bank_vals0 = bank_vals0.at[1].set(seg_first)

    def step(carry, t):
        bank_feats, bank_vals = carry
        query = jax.lax.dynamic_index_in_dim(feats_pad, t, 0,
                                             keepdims=False)
        valid = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (jnp.arange(p) < t).astype(jnp.int32)], axis=0)
        seg_logit = pallas_local_topk_attend(
            query, bank_feats, bank_vals, valid, radius=float(radius),
            temperature=cfg.temperature, topk=cfg.topk, h=h, w=w,
            tile=tile, scores_dtype=cfg.pallas_scores,
            fetch_mode=cfg.pallas_fetch,
            matmul_precision=cfg.pallas_precision,
            store_mode=cfg.pallas_store,
            matmul_mode=cfg.pallas_matmul,
            group_frames=cfg.pallas_group_frames,
            extract_mode=cfg.pallas_extract,
            interpret=cfg.pallas_interpret)
        slot = 1 + jnp.mod(t, p)
        bank_feats = jax.lax.dynamic_update_index_in_dim(
            bank_feats, query, slot, 0)
        bank_vals = jax.lax.dynamic_update_index_in_dim(
            bank_vals, seg_logit, slot, 0)
        return (bank_feats, bank_vals), seg_logit

    _, seg_logits = jax.lax.scan(step, (bank_feats0, bank_vals0),
                                 jnp.arange(1, t_total))
    return jnp.concatenate([seg_first[None], seg_logits], axis=0)


def _propagate_video_decoupled(feats: jnp.ndarray, seg_first: jnp.ndarray,
                               cfg: PropagationConfig) -> jnp.ndarray:
    """Decoupled propagation (VERDICT r3 #1): phase 1 computes the merged
    top-k affinity (scores + source indices) for EVERY frame in one
    whole-video Pallas kernel — selection depends only on features, so it
    needs no sequential dependency; phase 2 is a trivial ``lax.scan``
    doing the label gather + softmax-weighted sum (the only part that
    actually depends on previously propagated labels: ~topk*K MACs per
    query). Results are identical to the scan tiers, including the
    reference's frame-0 duplication while t <= precede_frames and
    torch.topk tie order (reference: vanilla_tracker.py:132-160,
    local_attention.py:314-334)."""
    from .pallas_affinity_video import (pad_for_video_kernel,
                                        video_kernel_geometry,
                                        video_topk_affinity,
                                        video_topk_affinity2)
    t_total, h, w, c = feats.shape
    k_classes = seg_first.shape[-1]
    p = cfg.precede_frames
    radius = cfg.neighbor_range // 2
    tile = cfg.pallas_tile
    topk = cfg.topk

    if t_total < 2:
        return seg_first[None][:t_total]

    feats = l2_normalize(feats, axis=-1)
    if cfg.pallas_precision == 'bfloat16':
        feats = feats.astype(jnp.bfloat16)
    feats_pad = pad_for_video_kernel(feats, h, w, radius, tile)
    v2 = cfg.video_engine == 'v2'
    g = video_kernel_geometry(h, w, radius, tile)
    nth, ntw, th, tw, tws, kb_cap, r = (g['nth'], g['ntw'], g['th'],
                                        g['tw'], g['tws'], g['kb_cap'],
                                        g['r'])
    cap = (g['cap_c'] if cfg.video_compact else kb_cap) if v2 else kb_cap
    splits = cfg.video_bank_splits
    qq = cfg.video_qpair
    if v2:
        block_b = g['kbh'] * g['tws'] * c * feats_pad.dtype.itemsize
        q_n = tile[0] * tile[1]
        budget = 100 * 2**20

        def fits(n, q):
            span = -(-p // n)
            return ((span + 2 * q + 1) * block_b +
                    q * q_n * (span + q + 1) * cap * 4) < budget

        if qq == 0:
            # auto (measured, v5e): pairing wins only when the paired
            # single-pass ring fits VMEM; under bank splits it loses
            qq = 2 if (splits in (None, 1) and fits(1, 2)
                       and t_total > 2) else 1
        if splits is None:
            splits = 4
            for n in (1, 2, 3, 4):
                if fits(n, qq):
                    splits = n
                    break
    elif splits is None:
        block_b = g['kbh'] * g['tws'] * c * feats_pad.dtype.itemsize
        q_n = tile[0] * tile[1]
        budget = 72 * 2**20
        splits = 4
        for n in (1, 2, 3, 4):
            span = -(-p // n)
            if ((span + 3) * block_b +
                    q_n * (span + 2) * kb_cap * 4) < budget:
                splits = n
                break
    if v2:
        top_s, top_i = video_topk_affinity2(
            feats_pad, radius=float(radius), temperature=cfg.temperature,
            topk=topk, precede_frames=p, h=h, w=w, tile=tile,
            interpret=cfg.pallas_interpret, bank_splits=int(splits),
            qpair=int(qq), compact=cfg.video_compact)
        # (nth, ntw, T, topk, q_n) -> (nth, ntw, T, q_n, topk)
        top_s = jnp.swapaxes(top_s, 3, 4)
        top_i = jnp.swapaxes(top_i, 3, 4)
    else:
        top_s, top_i = video_topk_affinity(
            feats_pad, radius=float(radius), temperature=cfg.temperature,
            topk=topk, precede_frames=p, h=h, w=w, tile=tile,
            interpret=cfg.pallas_interpret,
            early_exit=cfg.video_early_exit,
            extract=cfg.video_extract, bank_splits=int(splits),
            sweep_rows=cfg.video_sweep_rows,
            pass_mode=cfg.video_pass_mode)

    # ---- decode flat indices -> (source frame, y, x) ----
    # shapes (nth, ntw, T, q_n, topk)
    j = top_i // cap
    pos = top_i % cap
    a = pos // tws
    b = pos % tws
    if v2 and cfg.video_compact:
        # compact lanes are qi-shifted: absolute block row = a_rel + qi
        q_n = th * tw
        qi_vec = (jnp.arange(q_n) // tw).reshape(1, 1, 1, q_n, 1)
        a = a + qi_vec
    oy = (jnp.arange(nth) * th).reshape(nth, 1, 1, 1, 1)
    ox = (jnp.arange(ntw) * tw).reshape(1, ntw, 1, 1, 1)
    ky = jnp.clip(oy + a - r, 0, h - 1)
    kx = jnp.clip(ox + b - r, 0, w - 1)
    t_idx = jnp.arange(t_total).reshape(1, 1, t_total, 1, 1)
    # bank position 0 = prepended first frame; position j>=1 = ring slot
    # semantics: latest frame f < t with f % P == j-1
    f_src = jnp.where(
        j == 0, 0, t_idx - 1 - jnp.mod(t_idx - 1 - (j - 1), p))
    f_src = jnp.clip(f_src, 0, t_total - 1)
    weights = jax.nn.softmax(top_s, axis=-1)

    def to_thwk(x):
        """(nth, ntw, T, q_n, topk) -> (T, h, w, topk)."""
        q_n = th * tw
        x = jnp.moveaxis(x, 2, 0)          # (T, nth, ntw, q_n, k)
        x = x.reshape(t_total, nth, ntw, th, tw, topk)
        x = jnp.moveaxis(x, 3, 2)          # (T, nth, th, ntw, tw, k)
        x = x.reshape(t_total, nth * th, ntw * tw, topk)
        return x[:, :h, :w]

    weights = to_thwk(weights)
    flat_src = to_thwk(f_src * (h * w) + ky * w + kx)

    # ---- phase 2: sequential value gather (the tiny part) ----
    seg0 = jnp.zeros((t_total, h * w, k_classes), jnp.float32)
    seg0 = seg0.at[0].set(seg_first.reshape(h * w, k_classes))

    def step(seg_flat_all, t):
        idx = jax.lax.dynamic_index_in_dim(flat_src, t, 0, keepdims=False)
        wgt = jax.lax.dynamic_index_in_dim(weights, t, 0, keepdims=False)
        vals = seg_flat_all.reshape(t_total * h * w, k_classes)[idx]
        out = jnp.einsum('hwk,hwkc->hwc', wgt, vals,
                         preferred_element_type=jnp.float32)
        seg_flat_all = jax.lax.dynamic_update_index_in_dim(
            seg_flat_all, out.reshape(h * w, k_classes), t, 0)
        return seg_flat_all, None

    seg_all, _ = jax.lax.scan(step, seg0, jnp.arange(1, t_total))
    return seg_all.reshape(t_total, h, w, k_classes)
