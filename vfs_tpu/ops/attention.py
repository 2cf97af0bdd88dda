"""Masked top-k attention over a video feature bank (pure-JAX reference path).

This is the functional core of DAVIS/JHMDB/VIP label propagation
(reference: mmaction/models/common/local_attention.py:237-348,
``masked_attention_efficient``): normalize Q/K, affinity ``K·Q/τ``, radius
mask to -inf (optionally exempting the first ``non_mask_len`` key frames),
top-k along the key axis, softmax (or clamped-cosine²) over the kept keys,
and a weighted sum of values.

TPU-first design notes:
  - channels-last: query ``(N, Hq, Wq, C)``, key/value ``(N, T, H, W, C*)``;
    the affinity contraction runs over the last (lane) dim → MXU.
  - queries are processed in static-size chunks with ``lax.map`` (the
    reference uses a python loop with step=32; we default to a much larger
    chunk because HBM, not L2, is the working set).
  - a fused Pallas kernel implementing the same math lives in
    ``vfs_tpu.ops.attention_pallas``; this module is the semantics reference
    and the CPU/interpret fallback.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .affinity import NEG_INF, l2_normalize


def masked_attention_efficient(query: jnp.ndarray,
                               key: jnp.ndarray,
                               value: jnp.ndarray,
                               mask: Optional[jnp.ndarray] = None,
                               temperature: float = 1.0,
                               topk: Optional[int] = None,
                               normalize: bool = True,
                               step: Optional[int] = None,
                               non_mask_len: int = 0,
                               mode: str = 'softmax') -> jnp.ndarray:
    """Chunked masked top-k attention.

    Args:
        query: ``(N, Hq, Wq, C)``.
        key: ``(N, T, H, W, C)`` (or ``(N, H, W, C)``, treated as T=1).
        value: ``(N, T, H, W, Cv)`` matching key's T/H/W.
        mask: bool ``(H*W, Hq*Wq)`` indexed [key_pos, query_pos], or None.
        temperature: affinity temperature τ.
        topk: keep top-k keys per query (None = all).
        normalize: L2-normalize Q and K over channels.
        step: query-chunk size (None = whole query in one shot).
        non_mask_len: number of leading key frames exempt from the mask
            (reference local_attention.py:307-312).
        mode: 'softmax' or 'cosine' (clamp(min=0)**2).

    Returns:
        ``(N, Hq, Wq, Cv)``.
    """
    assert mode in ('softmax', 'cosine')
    if key.ndim == 4:
        key = key[:, None]
        value = value[:, None]
    n, t, h, w, c = key.shape
    _, hq, wq, _ = query.shape
    cv = value.shape[-1]
    assert 0 <= non_mask_len < t
    if normalize:
        query = l2_normalize(query, axis=-1)
        key = l2_normalize(key, axis=-1)

    key_flat = key.reshape(n, t * h * w, c)
    value_flat = value.reshape(n, t * h * w, cv)
    query_flat = query.reshape(n, hq * wq, c)

    num_queries = hq * wq
    if step is None or step >= num_queries:
        out = _attend_chunk(query_flat, key_flat, value_flat, mask,
                            temperature, topk, non_mask_len, mode, t, h, w)
        return out.reshape(n, hq, wq, cv)

    # pad queries to a multiple of step, scan over chunks
    num_chunks = -(-num_queries // step)
    pad = num_chunks * step - num_queries
    query_pad = jnp.pad(query_flat, ((0, 0), (0, pad), (0, 0)))
    mask_pad = None
    if mask is not None:
        mask_pad = jnp.pad(mask, ((0, 0), (0, pad)))
    q_chunks = query_pad.reshape(n, num_chunks, step, c)
    q_chunks = jnp.moveaxis(q_chunks, 1, 0)  # (chunks, n, step, c)

    if mask_pad is not None:
        m_chunks = mask_pad.reshape(h * w, num_chunks, step)
        m_chunks = jnp.moveaxis(m_chunks, 1, 0)  # (chunks, hw, step)

        def body(args):
            q, m = args
            return _attend_chunk(q, key_flat, value_flat, m, temperature,
                                 topk, non_mask_len, mode, t, h, w)

        outs = jax.lax.map(body, (q_chunks, m_chunks))
    else:
        def body(q):
            return _attend_chunk(q, key_flat, value_flat, None, temperature,
                                 topk, non_mask_len, mode, t, h, w)

        outs = jax.lax.map(body, q_chunks)

    # (chunks, n, step, cv) -> (n, chunks*step, cv) -> crop pad
    outs = jnp.moveaxis(outs, 0, 1).reshape(n, num_chunks * step, cv)
    outs = outs[:, :num_queries]
    return outs.reshape(n, hq, wq, cv)


def _attend_chunk(query: jnp.ndarray, key_flat: jnp.ndarray,
                  value_flat: jnp.ndarray, mask: Optional[jnp.ndarray],
                  temperature: float, topk: Optional[int], non_mask_len: int,
                  mode: str, t: int, h: int, w: int) -> jnp.ndarray:
    """One query chunk: (n, q, c) vs (n, K, c) -> (n, q, cv)."""
    n, q, c = query.shape
    scores = jnp.einsum(
        'nkc,nqc->nqk', key_flat, query,
        preferred_element_type=jnp.float32) / temperature  # (n, q, K)
    if mask is not None:
        # mask: (h*w, q) [key_pos, query_pos] -> per-frame, exempting the
        # first non_mask_len frames (reference :307-312)
        m = mask.T[None]  # (1, q, h*w)
        m = jnp.broadcast_to(m, (t - non_mask_len, q, h * w))
        if non_mask_len > 0:
            ones = jnp.ones((non_mask_len, q, h * w), dtype=bool)
            m = jnp.concatenate([ones, m], axis=0)
        m = jnp.moveaxis(m, 0, 1).reshape(1, q, t * h * w)
        scores = jnp.where(m, scores, NEG_INF)
    if topk is not None:
        top_scores, top_idx = jax.lax.top_k(scores, topk)  # (n, q, k)
        if mode == 'softmax':
            weights = jax.nn.softmax(top_scores, axis=-1)
        else:
            weights = jnp.square(jnp.clip(top_scores, min=0.0))
        # gather values: (n, K, cv) indexed by (n, q, k)
        top_values = jnp.take_along_axis(
            value_flat[:, None], top_idx[..., None], axis=2)  # (n,q,k,cv)
        out = jnp.einsum('nqk,nqkc->nqc', weights, top_values,
                         preferred_element_type=jnp.float32)
    else:
        if mode == 'softmax':
            weights = jax.nn.softmax(scores, axis=-1)
        else:
            weights = jnp.square(jnp.clip(scores, min=0.0))
        out = jnp.einsum('nqk,nkc->nqc', weights, value_flat,
                         preferred_element_type=jnp.float32)
    return out


def local_square_attention(query: jnp.ndarray,
                           key: jnp.ndarray,
                           value: jnp.ndarray,
                           kernel_size,
                           temperature: float = 1.0,
                           topk: Optional[int] = None,
                           batch_as_context: bool = False) -> jnp.ndarray:
    """Local-window attention via patch extraction.

    Reference: local_attention.py:8-84 (``local_square_attention``), which
    unfolds a k×k window around each query position (zero padding) and
    attends within it. Channels-last: query/key/value ``(N, H, W, C*)``.
    """
    n, hh, ww, c = query.shape
    cv = value.shape[-1]
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    kh, kw = kernel_size

    def unfold(x):
        # (N, H, W, C) -> (N, H, W, kh*kw, C) zero-padded patches
        patches = jax.lax.conv_general_dilated_patches(
            jnp.moveaxis(x, -1, 1), (kh, kw), (1, 1),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)))
        # patches: (N, C*kh*kw, H, W) with channel-major ordering
        cx = x.shape[-1]
        patches = patches.reshape(n, cx, kh * kw, hh, ww)
        return jnp.transpose(patches, (0, 3, 4, 2, 1))  # (N,H,W,khkw,C)

    key_p = unfold(key)
    value_p = unfold(value)
    if batch_as_context:
        # merge batch into window axis: every batch item's window is context
        key_p = key_p.reshape(1, hh, ww, n * kh * kw, c) \
            if n > 1 else key_p
        value_p = value_p.reshape(1, hh, ww, n * kh * kw, cv) \
            if n > 1 else value_p
    scores = jnp.einsum('nhwc,nhwkc->nhwk', query, key_p,
                        preferred_element_type=jnp.float32) / temperature
    if topk is not None:
        top_scores, top_idx = jax.lax.top_k(scores, topk)
        top_values = jnp.take_along_axis(value_p, top_idx[..., None], axis=3)
        out = jnp.einsum('nhwk,nhwkc->nhwc', top_scores, top_values,
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum('nhwk,nhwkc->nhwc', scores, value_p,
                         preferred_element_type=jnp.float32)
    return out
