"""Tensor layout helpers (reference: mmaction/models/common/utils.py).

Channels-last analogues: videos are ``(N, T, H, W, C)``, images
``(N, H, W, C)`` — so clip<->image reshapes are plain reshapes (the
reference needs transposes because its clip layout is (N, C, T, H, W),
utils.py:45-64)."""

from __future__ import annotations

import jax.numpy as jnp


def video2images(imgs: jnp.ndarray) -> jnp.ndarray:
    """(N, T, H, W, C) -> (N*T, H, W, C)."""
    n, t = imgs.shape[:2]
    return imgs.reshape(n * t, *imgs.shape[2:])


def images2video(imgs: jnp.ndarray, clip_len: int) -> jnp.ndarray:
    """(N*T, H, W, C) -> (N, T, H, W, C)."""
    nt = imgs.shape[0]
    return imgs.reshape(nt // clip_len, clip_len, *imgs.shape[1:])


def normalize_logit(seg_logit: jnp.ndarray) -> jnp.ndarray:
    """Channel-wise spatial min-max normalization, applied only where the
    channel max is positive (reference utils.py:197-206 ``normalize_logit``;
    also inlined in vanilla_tracker.py:167-175). Channels-last (..., H, W, K).
    """
    smin = jnp.min(seg_logit, axis=(-3, -2), keepdims=True)
    smax = jnp.max(seg_logit, axis=(-3, -2), keepdims=True)
    normalized = (seg_logit - smin) / (smax - smin + 1e-12)
    return jnp.where(smax > 0, normalized, seg_logit)


def mean_list(tensors):
    out = tensors[0]
    for t in tensors[1:]:
        out = out + t
    return out / len(tensors)


def unmap(data: jnp.ndarray, count: int, inds: jnp.ndarray,
          fill=0) -> jnp.ndarray:
    """Scatter a subset back to the original item count (reference
    common/utils.py:105-116 ``unmap``; exported helper). ``inds`` is a
    boolean mask of length ``count``; rows of ``data`` land at its True
    positions, everything else is ``fill``."""
    inds = inds.astype(bool)
    shape = (count,) + data.shape[1:]
    full = jnp.full(shape, fill, dtype=data.dtype)
    return full.at[jnp.nonzero(inds, size=data.shape[0])[0]].set(data)


def clamp(x: jnp.ndarray, min=None, max=None) -> jnp.ndarray:
    """Functional stand-in for the reference's ``Clamp`` module
    (common/utils.py:170-189) — in JAX a module wrapper around clip adds
    nothing, so this is ``jnp.clip`` with the same argument contract."""
    assert min is not None or max is not None
    return jnp.clip(x, min, max)
