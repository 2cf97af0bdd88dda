#!/usr/bin/env python
"""Feature-extraction stage A/B bench (VERDICT r2 weak #2).

Times ``VanillaTracker._extract_feats`` (the backbone over frame chunks
inside one jit — the replacement for the reference's chunked
``get_feats``, reference mmaction/models/trackers/vanilla_tracker.py:
55-75) on RESIDENT device data at DAVIS-480p shapes, sweeping
``batch_step`` and backbone dtype, and reports per-variant FLOPs + MFU
from XLA's own cost analysis.

Usage: python tools/analysis/bench_extract.py [--frames 80]
       [--hw 480 854] [--depth 18] [--steps 5 10 20 40]
"""

import argparse
import os.path as osp
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))

V5E_PEAK_FLOPS = {'bfloat16': 197e12, 'float32': 197e12 / 4}


def parse_args():
    p = argparse.ArgumentParser(description='extraction stage bench')
    p.add_argument('--frames', type=int, default=80)
    p.add_argument('--hw', type=int, nargs=2, default=(480, 854))
    p.add_argument('--depth', type=int, default=18)
    p.add_argument('--steps', type=int, nargs='*', default=(5, 10, 20, 40))
    p.add_argument('--repeats', type=int, default=3)
    p.add_argument('--uint8', action='store_true', default=True,
                   help='feed uint8 + on-device normalize (production)')
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')
    from vfs_tpu.models import build_model

    t, (h, w) = args.frames, args.hw
    rng = np.random.RandomState(0)
    imgs_host = rng.randint(0, 255, (t, h, w, 3), np.uint8)
    mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
    std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)

    tiny = jax.jit(lambda x: x + 1)
    float(tiny(jnp.zeros(())))
    rtts = []
    for _ in range(3):
        t0 = time.time()
        float(tiny(jnp.zeros(())))
        rtts.append(time.time() - t0)
    rtt = statistics.median(rtts)
    print(f'depth={args.depth} {t}x{h}x{w} uint8 input (rtt ~{rtt*1e3:.0f} ms)')

    for dtype in ('float32', 'bfloat16'):
        model = build_model(
            dict(type='VanillaTracker',
                 backbone=dict(type='ResNet', depth=args.depth,
                               out_indices=(3,), dtype=dtype)),
            test_cfg=dict(precede_frames=20, topk=10, temperature=0.07,
                          strides=(1, 2, 1, 1), out_indices=(2,),
                          neighbor_range=24))
        model.init_weights(input_shape=(1, h, w, 3))
        imgs = jax.device_put(imgs_host)
        for bs in args.steps:
            if t % bs:
                continue
            feats = model._extract_feats(model.variables, imgs, bs,
                                         mean, std)
            float(feats[0].sum())  # force
            times = []
            for _ in range(args.repeats):
                t0 = time.time()
                feats = model._extract_feats(model.variables, imgs, bs,
                                             mean, std)
                float(feats[0].sum())
                times.append(time.time() - t0)
            wall = max(statistics.median(times) - rtt, 1e-9)
            ms = 1000 * wall / t
            # exact FLOPs of the compiled extraction graph
            # jit's descriptor binds self for __call__ but not for
            # .lower — pass the (static) self explicitly
            lowered = model._extract_feats.lower(
                model, model.variables, imgs, bs, mean, std)
            cost = lowered.compile().cost_analysis()
            # XLA cost analysis counts the lax.map BODY once (one chunk
            # of ``bs`` frames), not the full loop — per-frame = /bs
            flops_pf = cost.get('flops', float('nan')) / bs
            mfu = (flops_pf / (wall / t)) / V5E_PEAK_FLOPS[dtype]
            print(f'{dtype:9s} batch_step={bs:3d} {ms:7.2f} ms/frame  '
                  f'{flops_pf/1e9:7.1f} GFLOP/frame  MFU={mfu*100:5.1f}%',
                  flush=True)


if __name__ == '__main__':
    main()
