"""YUV 4:2:0 host->device transport for eval inputs.

TPU-first design: video content is natively 4:2:0 (JPEG rawframes and
H.264 streams store one chroma sample per 2x2 block), yet the reference
pipeline converts to RGB on the host CPU and ships 3 bytes/pixel to the
device (reference mmaction/datasets/pipelines/loading.py:840-880 decode
+ tools/test.py eval loop). Over a host link that is the eval
bottleneck (bench.py ``host_link_GBps``), RGB transport wastes 2x: the
decoder already had the 1.5 byte/pixel planes in hand.

This module ships the planes instead and lifts the color conversion
into the jitted device graph, where it fuses with the normalize that
precedes conv1:

  host:   RGB uint8 -> planar I420 (cv2 fast path / numpy fallback)
          [or, in the native decoder path, the decoder's own yuv420p]
  link:   1.5 bytes/pixel (flat uint8 buffer, static shape)
  device: chroma nearest-upsample + BT.601 inverse + mean/std normalize,
          all inside the extraction jit.

Conventions match ``cv2.COLOR_RGB2YUV_I420`` exactly (measured, see
tests/test_ops/test_yuv.py): BT.601 *studio swing* (Y in [16,235],
chroma in [16,240]) with chroma taken from the top-left pixel of each
2x2 block. The round trip is lossy only in chroma (mean |err| ~1.8/255
on smooth content) — propagation-quality-neutral, gated by the fixture
J&F check in bench.py.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# BT.601 studio-swing forward coefficients (the cv2 I420 convention)
_KR, _KG, _KB = 0.299, 0.587, 0.114
_Y_SCALE = 219.0 / 255.0
_C_SCALE = 224.0 / 255.0


def yuv420_shape(h: int, w: int) -> Tuple[int, int, int]:
    """(even h, even w, flat bytes/frame) after the even-size padding."""
    he = h + (h % 2)
    we = w + (w % 2)
    return he, we, he * we * 3 // 2


def rgb_to_yuv420(imgs: np.ndarray) -> np.ndarray:
    """Pack (T, H, W, 3) RGB uint8 into flat planar I420, (T, He*We*3/2).

    Odd H/W are edge-padded to even before subsampling; the device
    unpack crops back. Uses cv2 when importable (~0.9 ms/frame at 480p,
    SIMD), else a numpy fallback replicating the same convention.
    """
    assert imgs.dtype == np.uint8 and imgs.ndim == 4 and imgs.shape[-1] == 3
    t, h, w = imgs.shape[:3]
    he, we, n = yuv420_shape(h, w)
    if (he, we) != (h, w):
        imgs = np.pad(imgs, ((0, 0), (0, he - h), (0, we - w), (0, 0)),
                      mode='edge')
    out = np.empty((t, n), np.uint8)
    try:
        import cv2
        for i in range(t):
            out[i] = cv2.cvtColor(imgs[i], cv2.COLOR_RGB2YUV_I420).reshape(-1)
        return out
    except ImportError:
        pass
    f = imgs.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 16.0 + (_KR * r + _KG * g + _KB * b) * _Y_SCALE
    # chroma from the top-left sample of each 2x2 block (cv2 convention)
    r2, g2, b2 = r[:, ::2, ::2], g[:, ::2, ::2], b[:, ::2, ::2]
    cb = 128.0 + (-0.168736 * r2 - 0.331264 * g2 + 0.5 * b2) * _C_SCALE
    cr = 128.0 + (0.5 * r2 - 0.418688 * g2 - 0.081312 * b2) * _C_SCALE
    hw = he * we
    out[:, :hw] = np.round(y).clip(0, 255).astype(np.uint8).reshape(t, -1)
    out[:, hw:hw + hw // 4] = np.round(cb).clip(0, 255).astype(
        np.uint8).reshape(t, -1)
    out[:, hw + hw // 4:] = np.round(cr).clip(0, 255).astype(
        np.uint8).reshape(t, -1)
    return out


def yuv420_planes_to_flat(y: np.ndarray, u: np.ndarray,
                          v: np.ndarray) -> np.ndarray:
    """Assemble decoder-native planes (T,He,We), (T,He/2,We/2) x2 into the
    flat transport layout ``rgb_to_yuv420`` produces."""
    t = y.shape[0]
    return np.concatenate([y.reshape(t, -1), u.reshape(t, -1),
                           v.reshape(t, -1)], axis=1)


def yuv420_to_rgb(buf: jnp.ndarray, h: int, w: int,
                  convention: str = 'studio') -> jnp.ndarray:
    """Jittable unpack: flat I420 (..., He*We*3/2) uint8 -> (..., H, W, 3)
    float32 RGB in [0, 255]. Chroma is nearest-upsampled (each 2x2 block
    shares its stored sample — the exact inverse of the top-left
    subsampling for 1 of 4 pixels, neighbor chroma for the rest).

    convention: 'studio' (BT.601 studio swing — what ``rgb_to_yuv420``
    / cv2 produce) or 'jpeg' (full-range JFIF YCbCr — what JPEG files
    store and the native decoder's yuv420 path emits verbatim).
    """
    assert convention in ('studio', 'jpeg'), convention
    he, we, n = yuv420_shape(h, w)
    lead = buf.shape[:-1]
    assert buf.shape[-1] == n, (buf.shape, n)
    hw = he * we
    y = buf[..., :hw].reshape(*lead, he, we).astype(jnp.float32)
    u = buf[..., hw:hw + hw // 4].reshape(
        *lead, he // 2, we // 2).astype(jnp.float32)
    v = buf[..., hw + hw // 4:].reshape(
        *lead, he // 2, we // 2).astype(jnp.float32)

    def up2(c):  # nearest 2x upsample on the trailing two dims
        c = jnp.repeat(c, 2, axis=-1)
        return jnp.repeat(c, 2, axis=-2)

    if convention == 'studio':
        yp = (y - 16.0) * (1.0 / _Y_SCALE)
        cb = (up2(u) - 128.0) * (1.0 / _C_SCALE)
        cr = (up2(v) - 128.0) * (1.0 / _C_SCALE)
    else:
        yp = y
        cb = up2(u) - 128.0
        cr = up2(v) - 128.0
    r = yp + 1.402 * cr
    g = yp - 0.344136 * cb - 0.714136 * cr
    b = yp + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    rgb = jnp.clip(rgb, 0.0, 255.0)
    return rgb[..., :h, :w, :]


class Yuv420Frames(np.ndarray):
    """(T, He*We*3/2) packed I420 frames with source geometry attached.

    ndarray subclass so pre-packed frames flow through dataset pipelines
    and ``Collect`` untouched; ``VanillaTracker.preload`` recognizes it
    and ships the planes as-is (no host repack). Produced by
    ``RawFrameDecodeYUV420`` (native libjpeg decode straight to planes,
    full-range 'jpeg' convention) or by any caller via
    ``Yuv420Frames(rgb_to_yuv420(imgs), hw, 'studio')``.
    """

    def __new__(cls, buf, hw, convention='studio'):
        obj = np.asarray(buf, dtype=np.uint8).view(cls)
        obj.hw = tuple(int(x) for x in hw)
        obj.convention = convention
        return obj

    def __array_finalize__(self, obj):
        if obj is not None:
            self.hw = getattr(obj, 'hw', None)
            self.convention = getattr(obj, 'convention', 'studio')
