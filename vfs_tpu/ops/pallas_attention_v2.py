"""Pallas kernel v2: per-frame top-k extraction with candidate merge.

Differences from v1 (pallas_attention.py):
  - no (Q, F*KB) scores buffer: each frame's scores are reduced to their
    top-k candidates immediately after the MXU matmul, while the slab is
    hot in VMEM (v1 wrote all F slabs then swept the full buffer k times);
  - candidates (scores + global flat indices) accumulate in a small
    (Q, (F+1)*k) buffer; the final exact top-k runs over that.

Exactness: global top-k ⊆ union of per-frame top-k, so results are
identical to v1 (ties break by lowest flat index in both; verified 0.0
diff on TPU).

Measured on TPU v5e at DAVIS-480p shapes: v2 wins standalone (~13 ms vs
~98 ms per dispatch) but LOSES inside the propagation scan (18.3 vs 10.2
ms/frame) — its 420-op sequential extract+merge chain cannot pipeline
with the key DMAs the way v1's batched sweeps do. The production scan
therefore uses v1; v2 serves single-shot queries.
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


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_kernel(th, tw, r, rw, radius, h, w, c, f_frames, topk,
                 temperature):
    kbh = th + 2 * r
    kbw = tw + 2 * rw
    q_n = th * tw
    kb_n = kbh * kbw
    kb_pad = _round_up(kb_n, 128)

    def kernel(valid_ref, query_ref, bank_feats_ref, mask_ref, out_s_ref,
               out_i_ref, q_buf, key_buf, mask_buf, sem_q, sem_k, sem_m):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        oy = ti * th
        ox = tj * tw

        cp_q = pltpu.make_async_copy(
            query_ref.at[pl.ds(oy + r, th), pl.ds(ox + rw, tw), :],
            q_buf, sem_q)
        cp_q.start()
        cp_m = pltpu.make_async_copy(mask_ref.at[ti, tj], mask_buf, sem_m)
        cp_m.start()
        cp_m.wait()
        cp_q.wait()

        def key_copy(f, slot):
            return pltpu.make_async_copy(
                bank_feats_ref.at[f, pl.ds(oy, kbh), pl.ds(ox, kbw), :],
                key_buf.at[slot], sem_k.at[slot])

        key_copy(0, 0).start()
        q = q_buf[:].reshape(q_n, c)
        col = lax.broadcasted_iota(jnp.int32, (q_n, kb_n), 1)

        def frame_body(f, carry):
            best_s, best_i = carry  # (q_n, topk) running global top-k
            slot = lax.rem(f, 2)

            @pl.when(f + 1 < f_frames)
            def _():
                key_copy(f + 1, lax.rem(f + 1, 2)).start()

            key_copy(f, slot).wait()
            keys = key_buf[slot].reshape(kb_n, c)
            scores = lax.dot_general(
                q, keys, (((1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32) * (1.0 / temperature)
            scores = scores + mask_buf[:, :kb_n]
            scores = jnp.where(valid_ref[f] > 0, scores, NEG_INF)
            base = f * kb_pad
            # per-frame extraction while the slab is hot in VMEM
            fr_s, fr_i = [], []
            for p in range(topk):
                m = jnp.max(scores, axis=1, keepdims=True)
                eq = scores >= m
                first = jnp.min(jnp.where(eq, col, kb_n), axis=1,
                                keepdims=True)
                fr_s.append(m)
                fr_i.append(first + base)
                if p + 1 < topk:
                    scores = jnp.where(col == first, NEG_INF, scores)
            # merge running top-k with this frame's candidates (2k lanes)
            cs = jnp.concatenate([best_s] + fr_s, axis=1)
            ci = jnp.concatenate([best_i] + fr_i, axis=1)
            new_s, new_i = [], []
            for p in range(topk):
                m = jnp.max(cs, axis=1, keepdims=True)
                eq = cs >= m
                gidx = jnp.min(jnp.where(eq, ci, jnp.int32(2**30)),
                               axis=1, keepdims=True)
                new_s.append(m)
                new_i.append(gidx)
                if p + 1 < topk:
                    cs = jnp.where(eq & (ci == gidx), NEG_INF, cs)
            return (jnp.concatenate(new_s, axis=1),
                    jnp.concatenate(new_i, axis=1))

        init = (jnp.full((q_n, topk), NEG_INF, jnp.float32),
                jnp.zeros((q_n, topk), jnp.int32))
        best_s, best_i = lax.fori_loop(0, f_frames, frame_body, init)
        out_s_ref[0, 0] = best_s
        out_i_ref[0, 0] = best_i

    return kernel, kbh, kbw, kb_pad, q_n, kb_n


@functools.partial(
    jax.jit,
    static_argnames=('radius', 'temperature', 'topk', 'tile', 'h', 'w',
                     'interpret'))
def pallas_local_topk_attend_v2(query_padded, bank_feats, bank_vals,
                                bank_valid, radius, temperature, topk,
                                h, w, tile: Tuple[int, int] = (8, 8),
                                interpret: bool = False):
    """Drop-in replacement for pallas_attention.pallas_local_topk_attend."""
    th, tw = tile
    r = int(math.ceil(radius - 1))
    rw = _round_up(r, 8)
    f_frames = bank_feats.shape[0]
    c = bank_feats.shape[-1]
    k_classes = bank_vals.shape[-1]
    nth = -(-h // th)
    ntw = -(-w // tw)

    kernel, kbh, kbw, kb_pad, q_n, kb_n = _make_kernel(
        th, tw, r, rw, float(radius), h, w, c, f_frames, topk,
        float(temperature))

    qi, qj = jnp.divmod(jnp.arange(q_n), tw)
    ka, kb2 = jnp.divmod(jnp.arange(kb_n), kbw)
    dy = (ka[None, :] - r) - qi[:, None]
    dx = (kb2[None, :] - rw) - qj[:, None]
    circle = (dy.astype(jnp.float32)**2 +
              dx.astype(jnp.float32)**2) < radius * radius
    oy = (jnp.arange(nth) * th)[:, None, None, None]
    ox = (jnp.arange(ntw) * tw)[None, :, None, None]
    aky = ka[None, None, None, :] + oy - r
    akx = kb2[None, None, None, :] + ox - rw
    inb = (aky >= 0) & (aky < h) & (akx >= 0) & (akx < w)
    qin = ((qi[None, None, :, None] + oy) < h) & \
        ((qj[None, None, :, None] + ox) < w)
    mask4 = jnp.where(circle[None, None] & inb & qin, 0.0,
                      NEG_INF).astype(jnp.float32)
    if kb_pad > kb_n:
        mask4 = jnp.pad(mask4, ((0, 0), (0, 0), (0, 0),
                                (0, kb_pad - kb_n)),
                        constant_values=NEG_INF)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nth, ntw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, q_n, topk), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_n, topk), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((th, tw, c), jnp.float32),         # q_buf
            pltpu.VMEM((2, kbh, kbw, c), jnp.float32),     # key_buf
            pltpu.VMEM((q_n, kb_pad), jnp.float32),        # mask
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    top_s, top_i = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nth, ntw, q_n, topk), jnp.float32),
            jax.ShapeDtypeStruct((nth, ntw, q_n, topk), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bank_valid.astype(jnp.int32), query_padded, bank_feats, mask4)

    # shared epilogue with v1
    f_idx = top_i // kb_pad
    rem = top_i % kb_pad
    a = rem // kbw
    b = rem % kbw
    ty = jnp.arange(nth)[:, None, None, None] * th
    tx = jnp.arange(ntw)[None, :, None, None] * tw
    y = jnp.clip(ty + a - r, 0, h - 1)
    x = jnp.clip(tx + b - rw, 0, w - 1)
    f_idx = jnp.clip(f_idx, 0, f_frames - 1)
    vals = bank_vals[f_idx, y, x]
    weights = jax.nn.softmax(top_s, axis=-1)
    out = jnp.einsum('abqk,abqkc->abqc', weights, vals,
                     preferred_element_type=jnp.float32)
    out = out.reshape(nth, ntw, th, tw, k_classes)
    out = jnp.moveaxis(out, 2, 1).reshape(nth * th, ntw * tw, k_classes)
    return out[:h, :w]
