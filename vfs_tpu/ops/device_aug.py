"""On-device (TPU) training augmentations.

The reference runs its whole augmentation chain on the host CPU per
frame (cv2/PIL — reference mmaction/datasets/pipelines/augmentations.py:
171 RandomResizedCrop, :600 Flip, :1224 GaussianBlur, :1257 GrayScale,
:1280 ColorJitter, :711 Normalize), which needs ~16 decord workers per
GPU to keep up (SURVEY §7 input-starve risk). Here the loader ships raw
uint8 frames at a fixed staging size and the ENTIRE chain — crop
sampling, fused crop+resize, flip, color jitter, grayscale, blur,
normalize — runs inside the jitted train step:

  * crop+resize is two separable matmuls per frame (MXU), the same trick
    as :mod:`vfs_tpu.ops.resize`;
  * blur is a depthwise separable convolution with per-frame gaussian
    taps;
  * everything else is elementwise VPU work fused by XLA into the
    surrounding step.

Semantics mirror the host pipeline's per-frame re-randomization gate
(``same_on_clip`` / ``same_across_clip``, reference
augmentations.py:285-300): params are drawn per frame, per clip, or per
sample and broadcast. Crop rectangles are sampled in ORIGINAL image
coordinates (each sample carries its pre-staging ``orig_hw``) and mapped
through the staging resize, so the crop distribution matches the host
pipeline even when staging distorts the aspect ratio.

Exactness: augmentation is random, so bit-parity with cv2 is not a goal;
each op is validated against its cv2/host counterpart under fixed
parameters in ``tests/test_ops/test_device_aug.py``.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_GRAY_W = (0.299, 0.587, 0.114)  # cv2 RGB2GRAY


def _param_shape(b: int, n: int, t: int, same_on_clip: bool,
                 same_across_clip: bool) -> Tuple[int, int, int]:
    """Broadcast shape of per-frame aug params (reference
    augmentations.py:285-300): new params per frame unless same_on_clip,
    per clip unless same_across_clip, else one draw per sample."""
    if not same_on_clip:
        return (b, n, t)
    if not same_across_clip:
        return (b, n, 1)
    return (b, 1, 1)


def _bcast(p: jnp.ndarray, b: int, n: int, t: int) -> jnp.ndarray:
    """(b?, n?, t?) params -> flat (b*n*t,) per-frame vector."""
    return jnp.broadcast_to(p, (b, n, t)).reshape(-1)


def sample_crop_rects(key: jnp.ndarray, hw: jnp.ndarray,
                      area_range: Tuple[float, float],
                      aspect_ratio_range: Tuple[float, float],
                      max_attempts: int = 10):
    """Vectorized 10-attempt crop sampler (reference
    augmentations.py:196-236 / host RandomResizedCrop.get_crop_bbox).

    hw: (..., 2) float image sizes. Returns (y, x, ch, cw) float arrays
    of the leading shape — the first of ``max_attempts`` (aspect, area)
    draws that fits, else the centered min-side square.
    """
    lead = hw.shape[:-1]
    h = hw[..., 0]
    w = hw[..., 1]
    k_ar, k_area, k_xy = jax.random.split(key, 3)
    min_ar, max_ar = aspect_ratio_range
    log_ar = jax.random.uniform(k_ar, lead + (max_attempts,),
                                minval=float(np.log(min_ar)),
                                maxval=float(np.log(max_ar)))
    aspect = jnp.exp(log_ar)
    area = jax.random.uniform(k_area, lead + (max_attempts,),
                              minval=area_range[0],
                              maxval=area_range[1]) * (h * w)[..., None]
    cand_w = jnp.round(jnp.sqrt(area * aspect))
    cand_h = jnp.round(jnp.sqrt(area / aspect))
    ok = (cand_h <= h[..., None]) & (cand_w <= w[..., None])
    any_ok = ok.any(axis=-1)
    first = jnp.argmax(ok, axis=-1)  # first True (0 if none)
    pick = lambda c: jnp.take_along_axis(c, first[..., None],
                                         axis=-1)[..., 0]
    side = jnp.minimum(h, w)
    ch = jnp.where(any_ok, pick(cand_h), side)
    cw = jnp.where(any_ok, pick(cand_w), side)
    u = jax.random.uniform(k_xy, lead + (2,))
    # randint(0, W - cw) inclusive -> floor(u * (range + 1))
    y_rand = jnp.floor(u[..., 0] * (h - ch + 1.0))
    x_rand = jnp.floor(u[..., 1] * (w - cw + 1.0))
    y = jnp.where(any_ok, y_rand, jnp.floor((h - side) / 2))
    x = jnp.where(any_ok, x_rand, jnp.floor((w - side) / 2))
    return y, x, ch, cw


def _resize_weights(starts: jnp.ndarray, sizes: jnp.ndarray, src: int,
                    out: int) -> jnp.ndarray:
    """(F,) crop starts/sizes (in source pixels, float) -> (F, out, src)
    bilinear sampling matrices (align_corners=False, cv2 semantics,
    border clamp)."""
    o = jnp.arange(out, dtype=jnp.float32)
    # source coordinate of output center o
    coord = starts[:, None] + (o[None, :] + 0.5) * (sizes[:, None] / out) \
        - 0.5
    coord = jnp.clip(coord, 0.0, src - 1.0)
    i = jnp.arange(src, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - i))  # F,out,src


def crop_resize(imgs: jnp.ndarray, rects, out_hw: Tuple[int, int]
                ) -> jnp.ndarray:
    """Fused per-frame crop + bilinear resize via two separable matmuls.

    imgs: (F, H, W, C) float; rects: (y, x, ch, cw) arrays of shape (F,)
    in imgs coordinates. Returns (F, out_h, out_w, C).
    """
    f, h, w, _ = imgs.shape
    y, x, ch, cw = rects
    wy = _resize_weights(y, ch, h, out_hw[0])        # (F, oh, H)
    wx = _resize_weights(x, cw, w, out_hw[1])        # (F, ow, W)
    tmp = jnp.einsum('foh,fhwc->fowc', wy, imgs,
                     preferred_element_type=jnp.float32)
    return jnp.einsum('fpw,fowc->fopc', wx, tmp,
                      preferred_element_type=jnp.float32)


def rgb_to_hsv(x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """RGB [0, 255] -> (H deg [0,360), S [0,1], V [0,255])."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    hr = jnp.mod((g - b) / safe_d, 6.0)
    hg = (b - r) / safe_d + 2.0
    hb = (r - g) / safe_d + 4.0
    hch = jnp.where(mx == r, hr, jnp.where(mx == g, hg, hb))
    hdeg = jnp.where(d > 0, 60.0 * hch, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return hdeg, s, mx


def hsv_to_rgb(hdeg: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray
               ) -> jnp.ndarray:
    c = v * s
    hp = hdeg / 60.0
    xx = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    r = jnp.select([hp < 1, hp < 2, hp < 3, hp < 4, hp < 5],
                   [c, xx, z, z, xx], c)
    g = jnp.select([hp < 1, hp < 2, hp < 3, hp < 4, hp < 5],
                   [xx, c, c, xx, z], z)
    b = jnp.select([hp < 1, hp < 2, hp < 3, hp < 4, hp < 5],
                   [z, z, xx, c, c], xx)
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def color_jitter(x: jnp.ndarray, bright: jnp.ndarray, contrast: jnp.ndarray,
                 sat: jnp.ndarray, hue: jnp.ndarray, apply: jnp.ndarray,
                 order: jnp.ndarray) -> jnp.ndarray:
    """torchvision ColorJitter semantics on (F, H, W, 3) float [0,255].

    The reference's ColorJitter (augmentations.py:1280-1320) delegates to
    ``torchvision.transforms.ColorJitter.get_params``, which applies the
    four adjustments in a RANDOM PERMUTATION per parameter draw;
    adjust_contrast blends against the mean of the GRAYSCALE image and
    adjust_saturation blends each pixel toward its grayscale value.
    ``order``: (F, 4) int32 permutation of op ids per frame. Each step
    clips to [0, 255] approximating torchvision's uint8 round-trip
    (float math, not bit-parity — the acknowledged device-aug non-goal).
    Per-frame params (F,) broadcast; ``apply`` gates the whole op."""
    e = (Ellipsis, None, None)  # (F,) -> (F, 1, 1)
    gw = jnp.asarray(_GRAY_W, x.dtype)

    def _brightness(y):
        return jnp.clip(y * bright[e + (None,)], 0.0, 255.0)

    def _contrast(y):
        gm = (y * gw).sum(-1).mean(axis=(1, 2))[:, None, None, None]
        return jnp.clip((y - gm) * contrast[e + (None,)] + gm, 0.0, 255.0)

    def _saturation(y):
        g = (y * gw).sum(-1, keepdims=True)
        return jnp.clip(g + (y - g) * sat[e + (None,)], 0.0, 255.0)

    def _hue(y):
        hdeg, s, v = rgb_to_hsv(y)
        hdeg = jnp.mod(hdeg + hue[e] * 360.0, 360.0)
        return hsv_to_rgb(hdeg, s, v)

    ops = (_brightness, _contrast, _saturation, _hue)
    y = x
    for i in range(4):
        cand = jnp.stack([op(y) for op in ops])  # (4, F, H, W, C)
        idx = order[None, :, i, None, None, None]
        y = jnp.take_along_axis(cand, idx, axis=0)[0]
    return jnp.where(apply[e + (None,)], y, x)


def grayscale(x: jnp.ndarray, apply: jnp.ndarray) -> jnp.ndarray:
    gw = jnp.asarray(_GRAY_W, x.dtype)
    g = (x * gw).sum(-1, keepdims=True)
    return jnp.where(apply[..., None, None, None],
                     jnp.broadcast_to(g, x.shape), x)


def gaussian_blur(x: jnp.ndarray, sigma: jnp.ndarray, apply: jnp.ndarray,
                  max_radius: int = 6) -> jnp.ndarray:
    """Per-frame separable gaussian blur as two depthwise convolutions.

    x: (F, H, W, C); sigma/apply: (F,). Taps follow cv2's
    getGaussianKernel truncation (radius = round(3*sigma) for uint8
    inputs); taps beyond the per-frame radius are zeroed before
    normalization. ``max_radius`` must cover round(3*max(sigma)) — the
    builder derives it from the configured sigma_range. Border mode
    reflect-101 (cv2 default).
    """
    f, h, w, c = x.shape
    taps = 2 * max_radius + 1
    i = jnp.arange(-max_radius, max_radius + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-6)[:, None]
    radius = jnp.round(3.0 * sig)
    k = jnp.exp(-0.5 * (i[None, :] / sig) ** 2)
    k = jnp.where(jnp.abs(i[None, :]) <= radius, k, 0.0)
    k = k / k.sum(axis=1, keepdims=True)                     # (F, taps)
    ident = jnp.zeros((taps,)).at[max_radius].set(1.0)
    k = jnp.where(apply[:, None], k, ident[None, :])
    # depthwise conv: channels = F*C, one kernel per (frame, channel)
    xt = jnp.moveaxis(x, -1, 1).reshape(1, f * c, h, w)
    kf = jnp.repeat(k, c, axis=0)                            # (F*C, taps)
    pad = [(0, 0), (0, 0), (max_radius, max_radius), (0, 0)]
    xv = jnp.pad(xt, pad, mode='reflect')
    out = jax.lax.conv_general_dilated(
        xv, kf.reshape(f * c, 1, taps, 1), (1, 1), 'VALID',
        feature_group_count=f * c,
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    pad = [(0, 0), (0, 0), (0, 0), (max_radius, max_radius)]
    xv = jnp.pad(out, pad, mode='reflect')
    out = jax.lax.conv_general_dilated(
        xv, kf.reshape(f * c, 1, 1, taps), (1, 1), 'VALID',
        feature_group_count=f * c,
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return jnp.moveaxis(out.reshape(f, c, h, w), 1, -1)


def build_device_aug(transforms: Sequence[Dict], norm_cfg: Dict,
                     out_hw: Tuple[int, int] = (224, 224)
                     ) -> Callable:
    """Compile an on-device augmentation chain from pipeline-style
    transform dicts (the same dicts a host ``train_pipeline`` uses).

    Supported types: RandomResizedCrop (fused with a following
    ``Resize(scale, keep_ratio=False)`` that sets ``out_hw``), Flip,
    ColorJitter, RandomGrayScale, RandomGaussianBlur. ``norm_cfg``
    (mean/std) is always applied last (host Normalize equivalent).

    Returns ``fn(imgs_u8, orig_hw, key) -> float32`` mapping
    ``(B, N, T, Hs, Ws, 3)`` uint8 staging frames (+ per-sample original
    ``(B, 2)`` sizes) to normalized ``(B, N, T, out_h, out_w, 3)``.
    """
    # every kwarg each transform type may carry on device; anything else
    # (same_clip_indices, typos, host-only features) fails loudly rather
    # than silently changing the augmentation distribution
    _FLAGS = ('same_on_clip', 'same_across_clip')
    _KNOWN = {
        'Resize': ('scale', 'keep_ratio'),
        'RandomResizedCrop': ('area_range', 'aspect_ratio_range') + _FLAGS,
        'Flip': ('flip_ratio', 'direction') + _FLAGS,
        'ColorJitter': ('brightness', 'contrast', 'saturation', 'hue',
                        'p') + _FLAGS,
        'RandomGrayScale': ('p',) + _FLAGS,
        'RandomGaussianBlur': ('p', 'sigma_range') + _FLAGS,
    }
    spec: List[Tuple] = []
    out_hw = tuple(out_hw)
    for t_cfg in transforms:
        t_cfg = dict(t_cfg)
        typ = t_cfg.pop('type')
        if typ not in _KNOWN:
            raise ValueError(f'device aug does not support {typ!r}; keep '
                             f'it on the host pipeline')
        unknown = sorted(set(t_cfg) - set(_KNOWN[typ]))
        if unknown:
            raise ValueError(
                f'device aug {typ}: unsupported kwargs {unknown} (the '
                f'host transform may support them — keep such pipelines '
                f'on the host)')
        if typ == 'Resize':
            scale = t_cfg.get('scale')
            if t_cfg.get('keep_ratio', True) or scale is None:
                raise ValueError('device aug Resize must be '
                                 'keep_ratio=False with explicit scale')
            out_hw = (int(scale[1]), int(scale[0]))  # (W, H) -> (H, W)
            continue
        spec.append((typ, t_cfg))
    if norm_cfg is None or 'mean' not in norm_cfg or 'std' not in norm_cfg:
        raise ValueError(
            'device aug needs normalization constants: set img_norm_cfg '
            'at the config top level or inside cfg.device_aug')
    mean = jnp.asarray(norm_cfg['mean'], jnp.float32)
    std = jnp.asarray(norm_cfg['std'], jnp.float32)
    if norm_cfg.get('to_bgr'):
        raise ValueError('device aug: to_bgr unsupported (keep RGB)')

    def fn(imgs: jnp.ndarray, orig_hw: jnp.ndarray, key: jnp.ndarray
           ) -> jnp.ndarray:
        b, n, t, hs, ws, c = imgs.shape
        fcount = b * n * t
        x = imgs.astype(jnp.float32).reshape(fcount, hs, ws, c)
        cropped = False
        for op_i, (typ, cfg) in enumerate(spec):
            key, sub = jax.random.split(key)
            g = _param_shape(b, n, t, cfg.get('same_on_clip', True),
                             cfg.get('same_across_clip', True))
            if typ == 'RandomResizedCrop':
                ohw = jnp.broadcast_to(
                    orig_hw.astype(jnp.float32)[:, None, None, :],
                    g + (2,))
                y, xr, ch, cw = sample_crop_rects(
                    sub, ohw, tuple(cfg.get('area_range', (0.08, 1.0))),
                    tuple(cfg.get('aspect_ratio_range', (3 / 4, 4 / 3))))
                # original -> staging coordinates (per-axis scale)
                sy = hs / ohw[..., 0]
                sx = ws / ohw[..., 1]
                rects = tuple(_bcast(v, b, n, t) for v in
                              (y * sy, xr * sx, ch * sy, cw * sx))
                x = crop_resize(x, rects, out_hw)
                cropped = True
            elif typ == 'Flip':
                if cfg.get('direction', 'horizontal') != 'horizontal':
                    axis = 1
                else:
                    axis = 2
                flip = jax.random.uniform(sub, g) < cfg.get(
                    'flip_ratio', 0.5)
                flip = _bcast(flip, b, n, t)
                x = jnp.where(flip[:, None, None, None],
                              jnp.flip(x, axis=axis), x)
            elif typ == 'ColorJitter':
                ks = jax.random.split(sub, 6)
                br = cfg.get('brightness', 0)
                co = cfg.get('contrast', 0)
                sa = cfg.get('saturation', 0)
                hu = cfg.get('hue', 0)
                bright = jax.random.uniform(ks[0], g,
                                            minval=max(0.0, 1 - br),
                                            maxval=1 + br)
                contrast = jax.random.uniform(ks[1], g,
                                              minval=max(0.0, 1 - co),
                                              maxval=1 + co)
                sat = jax.random.uniform(ks[2], g,
                                         minval=max(0.0, 1 - sa),
                                         maxval=1 + sa)
                hue = jax.random.uniform(ks[3], g, minval=-hu, maxval=hu)
                apply = jax.random.uniform(ks[4], g) < cfg.get('p', 1.0)
                # random op order per draw (torchvision get_params)
                perm = jnp.argsort(jax.random.uniform(ks[5], g + (4,)),
                                   axis=-1)
                order = jnp.stack(
                    [_bcast(perm[..., i], b, n, t) for i in range(4)], -1)
                x = color_jitter(x, *(_bcast(v, b, n, t) for v in
                                      (bright, contrast, sat, hue, apply)),
                                 order)
            elif typ == 'RandomGrayScale':
                apply = jax.random.uniform(sub, g) < cfg.get('p', 0.2)
                x = grayscale(x, _bcast(apply, b, n, t))
            elif typ == 'RandomGaussianBlur':
                ks = jax.random.split(sub, 2)
                lo, hi = cfg.get('sigma_range', (0.1, 2.0))
                sigma = jax.random.uniform(ks[0], g, minval=lo, maxval=hi)
                apply = jax.random.uniform(ks[1], g) < cfg.get('p', 0.5)
                x = gaussian_blur(x, _bcast(sigma, b, n, t),
                                  _bcast(apply, b, n, t),
                                  max_radius=max(1, int(round(3 * hi))))
        if not cropped:
            if (hs, ws) != out_hw:
                raise ValueError('device aug without RandomResizedCrop '
                                 f'needs staging == out size, got '
                                 f'{(hs, ws)} vs {out_hw}')
        x = (x - mean) / std
        return x.reshape(b, n, t, out_hw[0], out_hw[1], c)

    fn.out_hw = out_hw  # resolved output size (a Resize in the chain wins)
    return fn
