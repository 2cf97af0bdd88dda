#!/usr/bin/env python
"""Capture a jax.profiler trace of the propagation hot path.

VERDICT r3 #1's done-criterion alternative: the whole-video kernel's
extraction sweep is at its measured VPU issue roofline (~0.27 ms per
top-k pass + 1.15 ms fixed, PROGRESS r4); this tool records the
profiler evidence — a trace of N propagate_video calls at the DAVIS-480p
production shapes — and prints the per-op breakdown XLA reports, so the
"where does the time go" claim is a captured artifact, not subtraction.

Usage:
    python tools/analysis/profile_kernel.py [--out /tmp/vfs_prop_trace]
        [--frames 80] [--depth 18] [--repeats 5]

Inspect with: tensorboard --logdir <out>  (or read the .trace.json.gz).
"""

import argparse
import glob
import gzip
import json
import os.path as osp
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))


def parse_args():
    p = argparse.ArgumentParser(description='Propagation profiler trace')
    p.add_argument('--out', default='/tmp/vfs_prop_trace')
    p.add_argument('--frames', type=int, default=80)
    p.add_argument('--depth', type=int, default=18, choices=(18, 50))
    p.add_argument('--repeats', type=int, default=5)
    return p.parse_args()


def summarize_trace(out_dir, wall_ms):
    """Aggregate device-track event durations from the pb trace."""
    paths = glob.glob(osp.join(out_dir, '**', '*.trace.json.gz'),
                      recursive=True)
    if not paths:
        print('no trace json found (tensorboard-only format); '
              f'inspect {out_dir} with tensorboard')
        return
    path = max(paths, key=osp.getmtime)
    with gzip.open(path, 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # device tracks are pids whose process name mentions TPU/device
    dev_pids = set()
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            name = e.get('args', {}).get('name', '')
            if 'TPU' in name or 'device' in name.lower():
                dev_pids.add(e['pid'])
    per_op = defaultdict(float)
    for e in events:
        if e.get('ph') == 'X' and e.get('pid') in dev_pids:
            per_op[e.get('name', '?')] += e.get('dur', 0) / 1e3  # ms
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:15]
    total = sum(per_op.values())
    print(f'\ndevice trace: {total:.1f} ms on-device over {wall_ms:.1f} ms '
          f'wall ({path})')
    for name, ms in top:
        print(f'  {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  '
              f'{name[:90]}')


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')
    from vfs_tpu.models.trackers.vanilla_tracker import (
        make_propagation_config)
    from vfs_tpu.ops.propagation import propagate_video

    if args.depth == 18:
        h, w, c, radius = 60, 108, 256, 12.0
        cfg_over = dict(neighbor_range=24)
    else:
        h, w, c, radius = 60, 108, 1024, 18.0
        cfg_over = dict(neighbor_range=36)
    test_cfg = dict(precede_frames=20, topk=10, temperature=0.07,
                    pallas_precision='bfloat16', backend='pallas_video',
                    **cfg_over)
    cfg, mask = make_propagation_config(test_cfg, h, w)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(args.frames, h, w, c), jnp.float32)
    seg = jnp.zeros((h, w, 8), jnp.float32)
    seg = seg.at[..., 0].set(1.0)
    seg = seg.at[10:30, 20:60, 0].set(0.0)
    seg = seg.at[10:30, 20:60, 1].set(1.0)

    out = propagate_video(feats, seg, mask, cfg)
    float(out.sum())  # compile + resident

    with jax.profiler.trace(args.out):
        t0 = time.time()
        for _ in range(args.repeats):
            out = propagate_video(feats, seg, mask, cfg)
        float(out.sum())
        wall_ms = 1000 * (time.time() - t0)
    per_frame = wall_ms / args.repeats / args.frames
    print(f'{args.repeats} x {args.frames} frames: {wall_ms:.1f} ms wall '
          f'= {per_frame:.2f} ms/frame (r{args.depth} shapes)')
    summarize_trace(args.out, wall_ms)


if __name__ == '__main__':
    main()
