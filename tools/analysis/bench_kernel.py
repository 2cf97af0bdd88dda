#!/usr/bin/env python
"""Propagation-kernel A/B bench: ms/frame for each backend/variant on the
DAVIS-480p stride-8 shapes, plus pixel agreement of every variant against
the exact fp32 pallas kernel.

Timing protocol (axon gotcha: block_until_ready does not block; each
dispatch pays a tunnel RTT): the whole T-frame scan runs inside ONE jit
(propagate_video) and completion is forced by fetching a scalar sum —
ms/frame = (wall - one RTT) / (T - 1).

Usage:
    python tools/analysis/bench_kernel.py [--frames 80] [--hw 60 108]
        [--radius 12] [--classes 8] [--repeats 3]
"""

import argparse
import os.path as osp
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))


def parse_args():
    parser = argparse.ArgumentParser(description='Kernel A/B bench')
    parser.add_argument('--frames', type=int, default=80)
    parser.add_argument('--hw', type=int, nargs=2, default=(60, 108),
                        help='feature grid (480p stride-8 r18: 60x107->108)')
    parser.add_argument('--radius', type=int, default=12,
                        help='circle radius in cells (= neighbor_range/2)')
    parser.add_argument('--classes', type=int, default=8)
    parser.add_argument('--channels', type=int, default=256)
    parser.add_argument('--repeats', type=int, default=3)
    parser.add_argument('--topk', type=int, default=10)
    parser.add_argument('--precede', type=int, default=20)
    parser.add_argument('--tiles', type=int, nargs='*', default=None,
                        help='flat list of tile pairs to sweep for the '
                             'pallas fp32 variant, e.g. --tiles 8 8 8 16 '
                             '16 16')
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')
    from vfs_tpu.ops.propagation import PropagationConfig, propagate_video

    t, (h, w), c, k = args.frames, args.hw, args.channels, args.classes
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(t, h, w, c), jnp.float32)
    seg = jnp.zeros((h, w, k), jnp.float32)
    seg = seg.at[..., 0].set(1.0)
    seg = seg.at[10:30, 20:60, 0].set(0.0)
    seg = seg.at[10:30, 20:60, 1].set(1.0)

    base = dict(precede_frames=args.precede, topk=args.topk,
                temperature=0.07, with_first=True, with_first_neighbor=True,
                with_norm=True, neighbor_range=2 * args.radius)
    tile = (8, 16) if args.radius >= 16 else (8, 8)
    if args.tiles:
        pairs = list(zip(args.tiles[::2], args.tiles[1::2]))
        variants = {
            f'pallas_fp32_{th}x{tw}': PropagationConfig(
                **base, backend='pallas', pallas_tile=(th, tw))
            for th, tw in pairs}
        variants['pallas_fp32'] = PropagationConfig(
            **base, backend='pallas', pallas_tile=tile)
    else:
        variants = {
            'tiled': PropagationConfig(**base, backend='tiled'),
            'pallas_fp32': PropagationConfig(**base, backend='pallas',
                                             pallas_tile=tile),
            'pallas_bf16': PropagationConfig(**base, backend='pallas',
                                             pallas_tile=tile,
                                             pallas_scores='bfloat16'),
            'pallas_wholefetch': PropagationConfig(
                **base, backend='pallas', pallas_tile=tile,
                pallas_fetch='whole'),
            'pallas_bf16mm': PropagationConfig(
                **base, backend='pallas', pallas_tile=tile,
                pallas_precision='bfloat16'),
            'pallas_batched': PropagationConfig(
                **base, backend='pallas', pallas_tile=tile,
                pallas_matmul='batched'),
            'pallas_bf16mm_batched': PropagationConfig(
                **base, backend='pallas', pallas_tile=tile,
                pallas_precision='bfloat16', pallas_matmul='batched'),
            'pallas_packed': PropagationConfig(
                **base, backend='pallas', pallas_tile=tile,
                pallas_extract='packed'),
            'pallas_bf16mm_packed': PropagationConfig(
                **base, backend='pallas', pallas_tile=tile,
                pallas_precision='bfloat16', pallas_extract='packed'),
            'video_fp32': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=tile, video_engine='v1'),
            'video_bf16mm': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=tile,
                pallas_precision='bfloat16',
                video_engine='v1'),
            'video_bf16mm_16x8': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=(16, 8),
                pallas_precision='bfloat16',
                video_engine='v1'),
            'video_bf16mm_perframe': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=tile,
                pallas_precision='bfloat16', video_extract='perframe',
                video_engine='v1'),
            'video_bf16mm_pf_noexit': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=tile,
                pallas_precision='bfloat16', video_extract='perframe',
                video_early_exit=False, video_engine='v1'),
            # sweep ILP A/B (r4: a wash — the sweep is issue-bound at
            # ~0.27 ms/pass r18, not latency-bound on the pass chain)
            'video_bf16mm_rows2': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=tile,
                pallas_precision='bfloat16', video_sweep_rows=2,
                video_engine='v1'),
            'video_bf16mm_rows4': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=tile,
                pallas_precision='bfloat16', video_sweep_rows=4,
                video_engine='v1'),
            # one-traversal (fused max+argmax) pass formulation —
            # measured SLOWER (4.12 vs 3.47 bf16mm, 6.22 vs 5.80 fp32
            # ms/frame r18): the argmax lowering outweighs the saved
            # traversal; flag documents the negative result
            'video_bf16mm_argmax': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=tile,
                pallas_precision='bfloat16', video_pass_mode='argmax',
                video_engine='v1'),
            # round-5 v2 engine (qi-compact stores + query pairing +
            # compact outputs; auto splits/qpair): r18 3.52 -> 2.80,
            # r50 8.67 -> 8.14 ms/frame on v5e
            'video2_bf16mm_auto': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=(8, 8),
                pallas_precision='bfloat16', video_engine='v2'),
            'video2_bf16mm_nocompact': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=(8, 8),
                pallas_precision='bfloat16', video_engine='v2',
                video_compact=False),
            'video2_bf16mm_q1': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=(8, 8),
                pallas_precision='bfloat16', video_engine='v2',
                video_qpair=1),
            'video2_fp32_auto': PropagationConfig(
                **base, backend='pallas_video', pallas_tile=(8, 8),
                video_engine='v2'),
        }

    # estimate the tunnel RTT with a trivial dispatch (force the compile
    # in the warmup — dispatch is async, so an unforced warmup would push
    # its compile latency into the timed call)
    tiny = jax.jit(lambda x: x + 1)
    float(tiny(jnp.zeros(())))
    rtts = []
    for _ in range(3):
        t0 = time.time()
        float(tiny(jnp.zeros(())))
        rtts.append(time.time() - t0)
    rtt = statistics.median(rtts)

    results, outputs, failed = {}, {}, {}
    for name, cfg in variants.items():
        try:
            out = propagate_video(feats, seg, None, cfg)  # compile
            float(out.sum())
        except Exception as e:  # e.g. wholefetch VMEM OOM at r50 C=1024
            failed[name] = str(e).split('\n')[0][:100]
            continue
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            out = propagate_video(feats, seg, None, cfg)
            float(out.sum())
            times.append(time.time() - t0)
        wall = statistics.median(times)
        ms = 1000 * max(wall - rtt, 1e-9) / (t - 1)
        results[name] = ms
        outputs[name] = np.asarray(out)

    ref = outputs['pallas_fp32'].argmax(-1)
    print(f'shapes: T={t} {h}x{w}x{c} K={k} radius={args.radius} '
          f'topk={args.topk} P={args.precede} tile={tile} '
          f'(rtt ~{1000 * rtt:.0f} ms)')
    for name, ms in results.items():
        agree = float((outputs[name].argmax(-1) == ref).mean())
        print(f'{name:22s} {ms:7.2f} ms/frame   argmax-agreement '
              f'vs pallas_fp32: {agree:.5f}')
    for name, err in failed.items():
        print(f'{name:22s}  FAILED: {err}')


if __name__ == '__main__':
    main()
