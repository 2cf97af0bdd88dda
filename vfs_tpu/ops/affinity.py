"""Affinity / propagation ops (pure JAX, TPU-first).

Functional equivalents of the reference's affinity utilities
(reference: mmaction/models/common/affinity_utils.py:6-174), re-designed for
channels-last layouts so the contraction dimension feeds the MXU directly.

Layout conventions (TPU-native, channels last):
  - images / feature maps: ``(N, H, W, C)``
  - videos / feature banks: ``(N, T, H, W, C)``
The reference uses NCHW/NCTHW; converters live in
``vfs_tpu.models.common.utils``.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along ``axis`` (torch F.normalize(p=2) semantics:
    x / max(||x||, eps))."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def compute_affinity(src: jnp.ndarray,
                     dst: jnp.ndarray,
                     temperature: float = 1.0,
                     normalize: bool = True,
                     softmax_axis: Optional[int] = None,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense affinity between two feature maps.

    Reference: affinity_utils.py:6-30 (``compute_affinity``) — but with
    channels-last input ``(N, H, W, C)`` and affinity ``(N, src_HW, dst_HW)``.

    Args:
        src, dst: ``(N, H, W, C)`` feature maps.
        softmax_axis: 1 (over src) or 2 (over dst) or None.
        mask: optional bool ``(N, src_HW, dst_HW)`` (or broadcastable).
    """
    n, hs, ws, c = src.shape
    _, hd, wd, _ = dst.shape
    src_flat = src.reshape(n, hs * ws, c)
    dst_flat = dst.reshape(n, hd * wd, c)
    if normalize:
        src_flat = l2_normalize(src_flat, axis=-1)
        dst_flat = l2_normalize(dst_flat, axis=-1)
    affinity = jnp.einsum('nic,njc->nij', src_flat, dst_flat,
                          preferred_element_type=jnp.float32) / temperature
    if mask is not None:
        affinity = jnp.where(mask, affinity, NEG_INF)
    if softmax_axis is not None:
        affinity = jax.nn.softmax(affinity, axis=softmax_axis)
    if mask is not None:
        affinity = jnp.nan_to_num(affinity, nan=0.0)
    return affinity


def propagate(img: jnp.ndarray, affinity: jnp.ndarray,
              topk: Optional[int] = None) -> jnp.ndarray:
    """Propagate labels/features through an affinity matrix.

    Reference: affinity_utils.py:33-50 (``propagate``) — the UVC-style
    top-k scheme: subtract the k-th largest per column, clamp at 0,
    renormalize columns to sum 1, then matmul.

    Args:
        img: ``(N, H, W, C)`` source values (keys).
        affinity: ``(N, src_HW, dst_HW)``.
    Returns:
        ``(N, Hd, Wd, C)`` where ``Hd*Wd == dst_HW`` and output spatial shape
        is assumed square to the affinity's dst side: caller reshapes; here
        we return ``(N, dst_HW, C)`` reshaped to img's H/W when they match.
    """
    n, h, w, c = img.shape
    if topk is not None:
        # k-th largest along the src axis for every dst column
        kth = jax.lax.top_k(jnp.swapaxes(affinity, 1, 2), topk)[0][..., -1]
        affinity = jnp.maximum(affinity - kth[:, None, :], 0.0)
        denom = jnp.clip(
            jnp.sum(affinity, axis=1, keepdims=True), min=1e-12)
        affinity = affinity / denom
    img_flat = img.reshape(n, h * w, c)
    new_img = jnp.einsum('nij,nic->njc', affinity, img_flat,
                         preferred_element_type=jnp.float32)
    return new_img.reshape(n, h, w, c)


def propagate_temporal(imgs: jnp.ndarray, affinities: jnp.ndarray,
                       topk: Optional[int] = None) -> jnp.ndarray:
    """Temporal variant: keys span a clip.

    Reference: affinity_utils.py:53-73.

    Args:
        imgs: ``(N, T, H, W, C)``.
        affinities: ``(N, T, H*W, H*W)`` (key frame, key pos, query pos).
    """
    n, t, h, w, c = imgs.shape
    affinities = affinities.reshape(n, t * h * w, h * w)
    if topk is not None:
        kth = jax.lax.top_k(jnp.swapaxes(affinities, 1, 2), topk)[0][..., -1]
        affinities = jnp.maximum(affinities - kth[:, None, :], 0.0)
        denom = jnp.clip(
            jnp.sum(affinities, axis=1, keepdims=True), min=1e-12)
        affinities = affinities / denom
    imgs_flat = imgs.reshape(n, t * h * w, c)
    out = jnp.einsum('nij,nic->njc', affinities, imgs_flat,
                     preferred_element_type=jnp.float32)
    return out.reshape(n, h, w, c)


def spatial_neighbor(height: int,
                     width: int,
                     neighbor_range: Union[int, Tuple[int, int]],
                     mode: str = 'circle',
                     transpose: bool = False) -> jnp.ndarray:
    """Boolean spatial-neighborhood mask ``(H*W, H*W)`` indexed
    ``[key_pos, query_pos]``.

    Reference: affinity_utils.py:119-156 (``spatial_neighbor``). The circle
    mode is ``dist(key, query) < neighbor_range // 2``; square mode is an
    axis-aligned box of side ``neighbor_range`` (inclusive bounds identical
    to the reference's unrolled loop).

    The reference builds the square mask with a python double loop on
    device; here both modes are closed-form coordinate math — O(HW^2)
    vectorized, jit-friendly, shape-static.
    """
    assert mode in ('circle', 'square')
    ky, kx = jnp.meshgrid(jnp.arange(height), jnp.arange(width),
                          indexing='ij')
    ky = ky.reshape(-1)
    kx = kx.reshape(-1)
    dy = ky[:, None] - ky[None, :]
    dx = kx[:, None] - kx[None, :]
    if mode == 'circle':
        radius = neighbor_range // 2
        dist = jnp.sqrt((dy.astype(jnp.float32))**2 +
                        (dx.astype(jnp.float32))**2)
        mask = dist < radius
    else:
        if isinstance(neighbor_range, int):
            nr_h = nr_w = neighbor_range
        else:
            nr_h, nr_w = neighbor_range
        # reference square: key row in [i - nr//2, i + nr//2] inclusive
        mask = (jnp.abs(dy) <= nr_h // 2) & (jnp.abs(dx) <= nr_w // 2)
    if transpose:
        mask = mask.T
    return mask


def grid_mask(grid1: jnp.ndarray, grid2: jnp.ndarray, radius: float,
              diag_norm: float = 224.0) -> jnp.ndarray:
    """Distance mask between two coordinate grids.

    Reference: affinity_utils.py:167-174. Grids are ``(N, H, W, 2)``
    channels-last (reference uses (N, 2, H, W)).
    """
    n, h1, w1, _ = grid1.shape
    _, h2, w2, _ = grid2.shape
    g1 = grid1.reshape(n, h1 * w1, 1, 2)
    g2 = grid2.reshape(n, 1, h2 * w2, 2)
    dist = jnp.sqrt(jnp.sum((g1 - g2)**2, axis=-1))
    scale = (h2**2 + w2**2)**0.5 / (diag_norm * 2**0.5)
    return dist * scale < radius
