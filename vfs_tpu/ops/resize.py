"""Resize ops with torch-parity semantics.

The propagation metric path is sensitive to interpolation details
(SURVEY §7 "hard parts"): the reference downsamples the first-frame
annotation with PIL-nearest (mmaction/models/common/utils.py:25-42) and
upsamples logits with ``F.interpolate(mode='bilinear',
align_corners=False)`` (vanilla_tracker.py:162-166).

- ``resize_bilinear`` == torch bilinear align_corners=False (half-pixel
  centers) == ``jax.image.resize(method='linear')``.
- ``pil_nearest_resize`` is a host-side numpy/PIL helper — PIL's NEAREST
  sampling grid differs from both torch and jax nearest; it must be
  bit-matched for J&F parity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _linear_resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, half-pixel centers with
    edge clamping (torch align_corners=False / jax.image 'linear' parity)."""
    scale = n_in / n_out
    pos = (np.arange(n_out) + 0.5) * scale - 0.5
    lo = np.floor(pos).astype(np.int64)
    frac = pos - lo
    hi = np.clip(lo + 1, 0, n_in - 1)
    lo = np.clip(lo, 0, n_in - 1)
    mat = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of ``(N, H, W, C)`` to ``(N, *size, C)``;
    half-pixel centers (torch align_corners=False parity).

    Implemented as two separable matmuls (MXU path) instead of the
    gather-based ``jax.image.resize`` — ~20x faster for the propagation
    decode upsample and numerically identical for 2-tap linear kernels
    (upsampling or mild downsampling). Falls back to jax.image.resize for
    >2x downscale where the anti-aliased kernel is wider than 2 taps.
    """
    n, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    if size[0] * 2 < h or size[1] * 2 < w:
        # jax.image linear resize antialiases on downsample (kernel wider
        # than 2 taps); keep exact behavior there
        return jax.image.resize(x, (n, size[0], size[1], c), method='linear')
    ry = jnp.asarray(_linear_resize_matrix(size[0], h))
    rx = jnp.asarray(_linear_resize_matrix(size[1], w))
    # separable order by FLOP count: y-first contracts at the OUTPUT
    # height (Hout*Win*(Hin+Wout) MACs), x-first at the input height
    # (Hin*Wout*(Win+Hout)). For the decode upsample (60x108 -> 480x854)
    # x-first is 1.57x fewer FLOPs. Same 2-tap weights either way; only
    # fp32 summation order differs (last-ulp).
    if size[0] * w * (h + size[1]) <= h * size[1] * (w + size[0]):
        out = jnp.einsum('oh,nhwc->nowc', ry, x,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum('pw,nowc->nopc', rx, out,
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum('pw,nhwc->nhpc', rx, x,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum('oh,nhpc->nopc', ry, out,
                         preferred_element_type=jnp.float32)
    return out


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of ``(N, H, W, C)`` matching torch
    ``F.interpolate(mode='nearest')`` (floor of src index = dst * scale)."""
    n, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    rows = jnp.floor(jnp.arange(size[0]) * (h / size[0])).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(size[1]) * (w / size[1])).astype(jnp.int32)
    rows = jnp.clip(rows, 0, h - 1)
    cols = jnp.clip(cols, 0, w - 1)
    return x[:, rows][:, :, cols]


def pil_nearest_resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Host-side PIL NEAREST resize of a 2-D array to ``size=(H, W)``.

    Parity target: mmcv.imresize(..., interpolation='nearest',
    backend='pillow') as used by ``pil_nearest_interpolate``
    (reference common/utils.py:25-42).
    """
    from PIL import Image
    dtype = img.dtype
    pil = Image.fromarray(np.ascontiguousarray(img.astype(np.float32)))
    resized = pil.resize((size[1], size[0]), resample=Image.NEAREST)
    return np.asarray(resized).astype(dtype)
