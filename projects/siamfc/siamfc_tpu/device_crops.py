"""On-device scale crops + response post-processing for SiamFC.

Round-4 redesign of the per-frame update (VERDICT r3 #6): the host's
3x (cv2 crop+resize) per frame plus the 3x cv2 bicubic response upsample
were the dominant non-amortizing cost on a 1-core host (~15 ms/frame,
PROGRESS r3). Now the host ships ONE integer-corner search region (a
numpy slice + constant-pad, no cv2 at all) and the device does the
sub-pixel work inside the update jit:

  - the 3 scale crops are 2-tap separable gathers whose taps and
    coefficients are built IN-JIT from traced scalars (per-scale integer
    corner + side length), replicating the host path BIT-FOR-BIT:
    integer-rounded corners (reference siamfc/ops.py:87-124's
    non-'faster' branch) and cv2.INTER_LINEAR's uint8 fixed-point
    pipeline — coefficients quantized to 1/2048 (INTER_RESIZE_COEF_BITS
    = 11) by exact integer arithmetic, one half-up descale at the end;
  - the response post-processing (reference siamfc_tracker_base.py:
    245-319) — x16 bicubic upsample (cv2.INTER_CUBIC kernel, A=-0.75),
    scale penalty, peak-scale selection, min/sum normalize, hann blend,
    argmax — runs on static-shape constants; only (scale_id, peak loc)
    return to the host.

Region sides are bucketed (multiples of 64) so jit compiles once per
bucket, not per frame.
"""

from __future__ import annotations

import numpy as np


def bucket_of(s_max: int, step: int = 64) -> int:
    return int(-(-int(s_max) // step) * step)


def cubic_resize_matrix(in_size: int, out_size: int,
                        a: float = -0.75) -> np.ndarray:
    """(out_size, in_size) cv2.INTER_CUBIC-compatible resize matrix
    (Keys kernel with A=-0.75, pixel-center alignment, border clamp)."""
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), np.float64)
    for o in range(out_size):
        x = (o + 0.5) * scale - 0.5
        base = int(np.floor(x))
        for t in range(-1, 3):
            d = abs(x - (base + t))
            if d < 1:
                c = (a + 2) * d**3 - (a + 3) * d**2 + 1
            elif d < 2:
                c = a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a
            else:
                c = 0.0
            w[o, min(max(base + t, 0), in_size - 1)] += c
    return w.astype(np.float32)


def make_region(img: np.ndarray, center, sizes, avg_color,
                bucket_step: int = 64):
    """Host side: ONE padded integer-corner region covering every scale
    crop. Returns (region uint8 (bucket, bucket, 3), offs (S, 2) int32
    per-scale corner offsets inside the region, sizes (S,) int32)."""
    sizes = np.asarray([int(round(float(s))) for s in sizes], np.int64)
    s_max = int(sizes.max())
    center = np.asarray(center, np.float32)
    corners = np.stack([
        np.round(np.round(center - (s - 1) / 2)).astype(np.int64)
        for s in sizes])                       # (S, 2) — host-path corners
    c0 = corners[int(np.argmax(sizes))]
    bucket = bucket_of(s_max, bucket_step)
    region = np.empty((bucket, bucket, 3), img.dtype)
    fill = np.asarray(avg_color)
    if np.issubdtype(img.dtype, np.integer):
        fill = np.rint(fill)  # cv2.copyMakeBorder saturate_cast rounds
    region[:] = fill.astype(img.dtype)
    sy0, sx0 = int(c0[0]), int(c0[1])
    y0, y1 = max(sy0, 0), min(sy0 + s_max, img.shape[0])
    x0, x1 = max(sx0, 0), min(sx0 + s_max, img.shape[1])
    if y1 > y0 and x1 > x0:
        region[y0 - sy0:y1 - sy0, x0 - sx0:x1 - sx0] = img[y0:y1, x0:x1]
    offs = (corners - c0[None]).astype(np.int32)
    return region, offs, sizes.astype(np.int32)


def bilinear_sample_matrix(bucket: int, out_size: int, corner, size):
    """Traced (out_size, bucket) matrix: sample the region's axis like
    the host path — crop [corner, corner+size) then cv2.INTER_LINEAR to
    ``out_size`` (pixel centers, clamped to the patch)."""
    import jax.numpy as jnp
    from jax import lax
    o = lax.broadcasted_iota(jnp.float32, (out_size, bucket), 0)
    j = lax.broadcasted_iota(jnp.float32, (out_size, bucket), 1)
    size = size.astype(jnp.float32)
    corner = corner.astype(jnp.float32)
    x = corner + (o + 0.5) * size / out_size - 0.5
    x = jnp.clip(x, corner, corner + size - 1)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(j - x))
    # zero contributions from outside the patch (clamped x sits on the
    # boundary pixel -> that pixel's hat weight is exactly 1)
    inside = (j >= corner) & (j <= corner + size - 1)
    return jnp.where(inside, w, 0.0)


_TAPS_CACHE = {}


def cv2_linear_taps(src: int, dst: int):
    """Host-side bit-replication of cv2 resizeGeneric's 8U INTER_LINEAR
    tap/coefficient build (opencv resize.cpp): the source position is
    computed in float32 — `fx = (float)((dx+0.5)*scale - 0.5)` — NOT
    double (replicating cv2's exact f32 rounding matters: the exact-
    rational formulation differs on ~4% of coefficient LSBs), edge taps
    snap to fx=0, and coefficients are `saturate_cast<short>(f * 2048)`
    with cvRound = rint, c0 rounded independently from its f32 `1.f-fx`
    (so c0+c1 != 2048 occasionally, as in cv2). Cached per (src, dst).
    Returns (lo, hi, c0, c1) int64 arrays of shape (dst,)."""
    key = (src, dst)
    if key not in _TAPS_CACHE:
        scale = src / dst
        dx = np.arange(dst)
        fx = ((dx + 0.5) * scale - 0.5).astype(np.float32)
        sx = np.floor(fx).astype(np.int64)
        fx = (fx - sx).astype(np.float32)
        left = sx < 0
        fx = np.where(left, np.float32(0), fx)
        sx = np.where(left, 0, sx)
        right = sx >= src - 1
        fx = np.where(right, np.float32(0), fx)
        sx = np.where(right, src - 1, sx)
        c0 = np.rint((np.float32(1.0) - fx) * np.float32(2048.0)
                     ).astype(np.int64)
        c1 = np.rint(fx * np.float32(2048.0)).astype(np.int64)
        _TAPS_CACHE[key] = (np.clip(sx, 0, src - 1),
                            np.clip(sx + 1, 0, src - 1), c0, c1)
    return _TAPS_CACHE[key]


def make_taps(offs, sizes, out_size: int) -> np.ndarray:
    """(S, 2) corner offsets + (S,) sizes -> (S, 8, out_size) int32 tap
    pack [lo_y, hi_y, cy0, cy1, lo_x, hi_x, cx0, cx1], with the tap
    indices pre-offset into the shared region. ~8 KB/frame host->device;
    the device side becomes pure integer gathers (no traced-scalar tap
    math, no MXU)."""
    s_num = len(sizes)
    taps = np.empty((s_num, 8, out_size), np.int32)
    for s in range(s_num):
        lo, hi, c0, c1 = cv2_linear_taps(int(sizes[s]), out_size)
        taps[s, 0] = lo + offs[s, 0]
        taps[s, 1] = hi + offs[s, 0]
        taps[s, 2] = c0
        taps[s, 3] = c1
        taps[s, 4] = lo + offs[s, 1]
        taps[s, 5] = hi + offs[s, 1]
        taps[s, 6] = c0
        taps[s, 7] = c1
    return taps


def device_scale_crops(region, taps):
    """(bucket, bucket, 3) uint8 + (S, 8, out) int32 taps ->
    (S, out, out, 3) float32 crops, BIT-EXACT to the host path's cv2
    uint8 output (ops.crop_and_resize) for downscale crops and within
    +-1 LSB on <=0.2% of pixels for upscale crops (measured; those
    shapes dispatch to a different cv2 SIMD/IPP kernel). The pipeline
    replicates cv2's classic 2048-fixed-point path in exact int32
    arithmetic: horizontal X = c0*v0 + c1*v1 (<= 2^20), then the
    VResizeLinearVec_32s8u reduction — x = X >> 4, multiply-high
    truncation (x*b) >> 16, and the rounding descale (h0 + h1 + 2) >> 2.
    All gathers/VPU integer ops — no MXU, so no bf16 default-precision
    hazard (the round-4 matmul formulation silently ran at bf16 input
    precision on TPU and drifted up to 1.4/255 per pixel, flipping
    response argmaxes over long sequences)."""
    import jax.numpy as jnp
    reg = region.astype(jnp.int32)
    crops = []
    for s in range(taps.shape[0]):
        ly, hy, cy0, cy1 = taps[s, 0], taps[s, 1], taps[s, 2], taps[s, 3]
        lx, hx, cx0, cx1 = taps[s, 4], taps[s, 5], taps[s, 6], taps[s, 7]
        x = (reg[:, lx] * cx0[None, :, None] +
             reg[:, hx] * cx1[None, :, None]) >> 4
        r = (((x[ly] * cy0[:, None, None]) >> 16) +
             ((x[hy] * cy1[:, None, None]) >> 16) + 2) >> 2
        crops.append(jnp.clip(r, 0, 255).astype(jnp.float32))
    return jnp.stack(crops)


def device_response_post(responses, up_mat, hann, scale_penalty,
                         window_influence):
    """(S, r, r) raw responses -> (scale_id, loc_y, loc_x) exactly like
    the host _apply_response up to its argmax (reference
    siamfc_tracker_base.py:245-319)."""
    import jax
    import jax.numpy as jnp
    s_num = responses.shape[0]
    # HIGHEST: default MXU precision truncates f32 inputs to bf16 —
    # enough drift (~6e-3 relative) to flip peak argmaxes vs the host's
    # f32 cv2 bicubic
    up = jnp.einsum('yi,sij,xj->syx', up_mat, responses, up_mat,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    scale_ids = jnp.arange(s_num)
    pen = jnp.where(scale_ids == s_num // 2, 1.0, scale_penalty)
    up = up * pen[:, None, None]
    scale_id = jnp.argmax(jnp.max(up, axis=(1, 2)))
    r = up[scale_id]
    r = r - r.min()
    r = r / (r.sum() + 1e-16)
    r = (1 - window_influence) * r + window_influence * hann
    loc = jnp.argmax(r)
    upscale = r.shape[-1]
    return scale_id, loc // upscale, loc % upscale
