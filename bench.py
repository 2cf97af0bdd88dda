#!/usr/bin/env python
"""Headline benchmark: DAVIS-2017 480p label-propagation frames/sec/chip.

Runs the full eval hot path on one chip — ResNet-18 (eval strides
(1,2,1,1), out stride 8) feature extraction over a 480x854 video,
ring-buffer masked top-k propagation (P=20, topk=10, circle r=12 cells,
temperature 0.07 — the reference test_cfg), and per-frame decode
(bilinear upsample + minmax-norm + argmax) — and reports frames/sec.

``vs_baseline`` compares against the reference implementation's measured
throughput on this host's CPU (torch 2.13, 1 thread — the same
torch-semantics math, measured 2026-08-16 via tests/test_models +
tests/test_ops reference implementations: 1.4 s/frame ResNet-18 480p
forward + 23.7 s/frame masked attention = 0.0398 frames/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# reference (torch CPU, 1 thread) frames/sec on the identical workload
CPU_BASELINE_FPS = 0.0398

T_FRAMES = 80
HEIGHT, WIDTH = 480, 854
NUM_CLASSES = 12


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    from vfs_tpu.models import build_model

    model = build_model(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,))),
        test_cfg=dict(precede_frames=20, topk=10, temperature=0.07,
                      strides=(1, 2, 1, 1), out_indices=(2,),
                      neighbor_range=24, with_first=True,
                      with_first_neighbor=True, batch_step=10))
    model.init_weights(input_shape=(1, HEIGHT, WIDTH, 3))

    rng = np.random.RandomState(0)
    # uint8 frames + on-device normalization (the production input path)
    imgs = rng.randint(0, 255, (T_FRAMES, HEIGHT, WIDTH, 3), np.uint8)
    seg = np.zeros((HEIGHT, WIDTH), np.uint8)
    seg[100:250, 150:400] = 1
    seg[300:420, 500:700] = 2
    meta = [dict(original_shape=(HEIGHT, WIDTH),
                 img_norm_cfg=dict(
                     mean=np.array([123.675, 116.28, 103.53], np.float32),
                     std=np.array([58.395, 57.12, 57.375], np.float32)))]

    # warmup / compile
    preds = model.forward_test(imgs, seg, meta)
    assert preds[0].shape == (T_FRAMES, HEIGHT, WIDTH)

    # timed runs, mirroring the production eval loop: the next video's
    # host->device transfer (model.preload) overlaps the current video's
    # compute on a background thread (apis/test.py single_process_test)
    import concurrent.futures
    runs = int(os.environ.get('BENCH_RUNS', 3))
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    t0 = time.time()
    pending = pool.submit(model.preload, imgs)
    for i in range(runs):
        handle = pending.result()
        if i + 1 < runs:
            pending = pool.submit(model.preload, imgs)
        preds = model.forward_test(handle, seg, meta)
        np.asarray(preds[0]).sum()
    total = time.time() - t0
    pool.shutdown(wait=False)
    fps = T_FRAMES * runs / total
    print(json.dumps({
        'metric': 'davis480p_label_propagation_fps_per_chip',
        'value': round(fps, 2),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(fps / CPU_BASELINE_FPS, 1),
    }))


if __name__ == '__main__':
    main()
