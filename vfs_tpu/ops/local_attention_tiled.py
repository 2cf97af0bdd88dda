"""Locality-tiled masked top-k attention (TPU fast path).

The reference's circle mask (``spatial_neighbor`` radius = neighbor_range//2
cells, affinity_utils.py:119-156) makes the propagation attention *local*:
a query at cell (y, x) can only attend to keys within ``radius-1`` cells.
The generic path (attention.py / propagation.py) still computes all
H*W x F*H*W scores and masks 94% of them to -inf; this module tiles the
query grid and computes scores only against the dilated key block of each
tile — a ~5x cut in MXU work and (more importantly) in top-k width.

Exact-equivalence contract: identical results to ``attend_one_frame`` with
a circle mask whenever every bank frame is mask-subject (the default
``with_first_neighbor=True``); the engine falls back to the dense path
otherwise.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .affinity import NEG_INF


def _pad_to(x: jnp.ndarray, h: int, w: int, axis0: int, axis1: int):
    pads = [(0, 0)] * x.ndim
    pads[axis0] = (0, h - x.shape[axis0])
    pads[axis1] = (0, w - x.shape[axis1])
    return jnp.pad(x, pads)


def local_masked_topk_attend(query: jnp.ndarray,
                             bank_feats: jnp.ndarray,
                             bank_vals: jnp.ndarray,
                             bank_valid: jnp.ndarray,
                             radius: float,
                             temperature: float,
                             topk: int,
                             tile: Tuple[int, int] = (10, 16)) -> jnp.ndarray:
    """Tiled circle-masked top-k attention.

    Args:
        query: (H, W, C), L2-normalized already.
        bank_feats: (F, H, W, C) normalized; bank_vals: (F, H, W, K).
        bank_valid: (F,) bool.
        radius: circle radius in cells (keys with dist < radius attend).
        temperature, topk: as in masked_attention_efficient.
    Returns:
        (H, W, K) propagated logits.
    """
    h, w, c = query.shape
    f = bank_feats.shape[0]
    k_classes = bank_vals.shape[-1]
    th, tw = tile
    r = int(math.ceil(radius - 1))  # max integer offset with dist < radius
    nth = -(-h // th)
    ntw = -(-w // tw)
    hp, wp = nth * th, ntw * tw

    # pad query grid to tile multiples; pad bank by r (plus tile padding)
    qpad = _pad_to(query, hp, wp, 0, 1)
    bf = jnp.pad(bank_feats, ((0, 0), (r, r + hp - h), (r, r + wp - w),
                              (0, 0)))
    bv = jnp.pad(bank_vals, ((0, 0), (r, r + hp - h), (r, r + wp - w),
                             (0, 0)))
    kbh, kbw = th + 2 * r, tw + 2 * r

    # tile origin table
    ty = jnp.arange(nth) * th
    tx = jnp.arange(ntw) * tw
    origins = jnp.stack(jnp.meshgrid(ty, tx, indexing='ij'),
                        axis=-1).reshape(-1, 2)  # (T, 2)

    # relative coordinates: query (i, j) in tile <-> key (a, b) in block.
    # absolute: qy = oy + i, ky = oy + a - r  =>  dy = (a - r) - i
    qi = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).reshape(-1)
    qj = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).reshape(-1)
    ka = jax.lax.broadcasted_iota(jnp.int32, (kbh, kbw), 0).reshape(-1)
    kb = jax.lax.broadcasted_iota(jnp.int32, (kbh, kbw), 1).reshape(-1)
    dy = (ka[None, :] - r) - qi[:, None]  # (q, kb)
    dx = (kb[None, :] - r) - qj[:, None]
    circle = (dy.astype(jnp.float32)**2 +
              dx.astype(jnp.float32)**2)**0.5 < radius  # (q, kb)

    def per_tile(origin):
        oy, ox = origin[0], origin[1]
        qt = jax.lax.dynamic_slice(qpad, (oy, ox, 0), (th, tw, c))
        qt = qt.reshape(th * tw, c)
        kt = jax.lax.dynamic_slice(bf, (0, oy, ox, 0), (f, kbh, kbw, c))
        vt = jax.lax.dynamic_slice(bv, (0, oy, ox, 0), (f, kbh, kbw,
                                                        k_classes))
        kt = kt.reshape(f * kbh * kbw, c)
        vt = vt.reshape(f * kbh * kbw, k_classes)
        scores = jnp.einsum('kc,qc->qk', kt, qt,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32) / temperature
        # in-bounds: absolute key coords within the un-padded image
        aky = ka[None, :] + oy - r
        akx = kb[None, :] + ox - r
        inb = (aky >= 0) & (aky < h) & (akx >= 0) & (akx < w)
        # query in-bounds (tile padding): absolute query coords
        aqy = qi[:, None] + oy
        aqx = qj[:, None] + ox
        qin = (aqy < h) & (aqx < w)
        m = circle & inb & qin  # (q, kb)
        m = (m[:, None, :] & bank_valid[None, :, None]).reshape(
            th * tw, f * kbh * kbw)
        scores = jnp.where(m, scores, NEG_INF)
        ts, ti = jax.lax.top_k(scores, topk)
        wgt = jax.nn.softmax(ts, axis=-1)
        tv = vt[ti]  # (q, topk, K)
        return jnp.einsum('qk,qkc->qc', wgt, tv,
                          preferred_element_type=jnp.float32)

    outs = jax.lax.map(per_tile, origins)  # (T, th*tw, K)
    outs = outs.reshape(nth, ntw, th, tw, k_classes)
    outs = jnp.moveaxis(outs, 2, 1).reshape(hp, wp, k_classes)
    return outs[:h, :w]
