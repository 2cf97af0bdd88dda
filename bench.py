#!/usr/bin/env python
"""Headline benchmark: DAVIS-2017 480p label-propagation frames/sec/chip.

Runs the full eval hot path on one chip — ResNet-18 (eval strides
(1,2,1,1), out stride 8) feature extraction, ring-buffer masked top-k
propagation (P=20, topk=10, circle r=12 cells, temperature 0.07 — the
reference test_cfg), per-frame decode (bilinear upsample + minmax-norm +
argmax) — over a set of videos with distinct lengths and aspect buckets
(the production T/HW bucketing), and reports the median end-to-end
frames/sec across BENCH_RUNS passes.

Correctness gates (a perf win cannot silently buy a correctness loss):
  - pallas vs tiled backend pixel agreement >= 99.9% on one video;
  - mini-DAVIS fixture J&F (deterministic seed-0 weights) above floor.

``vs_baseline`` compares against the reference implementation's measured
throughput on this host's CPU (torch 2.13, 1 thread — the same
torch-semantics math, measured 2026-08-16 via tests/test_models +
tests/test_ops reference implementations: 1.4 s/frame ResNet-18 480p
forward + 23.7 s/frame masked attention = 0.0398 frames/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}
where "extra" breaks out compute-only fps, host-link bandwidth, per-pass
spread, and the correctness-gate values.
"""

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

import numpy as np

# reference (torch CPU, 1 thread) frames/sec on the identical workload
CPU_BASELINE_FPS = 0.0398

# distinct lengths and aspect buckets (DAVIS 480p keeps H=480, W varies)
VIDEO_SHAPES = [(80, 480, 854), (60, 480, 910), (100, 480, 768)]
NUM_CLASSES = 8

# pallas_precision='bfloat16': QK^T as one native MXU pass (fp32 is a
# 6-pass emulation) — 9.8 -> 6.8 ms/frame propagation, fixture-J&F
# neutral (0.5467 vs 0.5423). The agreement gate below still compares
# against the independent fp32 tiled tier, so the rounding is bounded.
TEST_CFG = dict(precede_frames=20, topk=10, temperature=0.07,
                strides=(1, 2, 1, 1), out_indices=(2,), neighbor_range=24,
                with_first=True, with_first_neighbor=True, batch_step=10,
                pallas_precision='bfloat16')

META = dict(img_norm_cfg=dict(
    mean=np.array([123.675, 116.28, 103.53], np.float32),
    std=np.array([58.395, 57.12, 57.375], np.float32)))


def make_videos():
    """Seeded moving-texture videos + multi-object first-frame segs."""
    videos = []
    rng = np.random.RandomState(0)
    for (t, h, w) in VIDEO_SHAPES:
        imgs = rng.randint(0, 255, (t, h, w, 3), np.uint8)
        seg = np.zeros((h, w), np.uint8)
        boxes = [(60, 150, 120, 120), (250, 90, 100, 160),
                 (340, 420, 90, 200), (120, 520, 140, 110),
                 (300, 640, 80, 90), (40, 700, 60, 60),
                 (400, 100, 60, 260)]
        for k, (y, x, bh, bw) in enumerate(boxes[:NUM_CLASSES - 1]):
            seg[y:y + bh, x:min(x + bw, w)] = k + 1
        meta = dict(original_shape=(h, w), **META)
        videos.append((imgs, seg, meta))
    return videos


def build_model():
    from vfs_tpu.models import build_model as _build
    # dtype='bfloat16' is the documented eval speed knob (fixture-J&F
    # neutral, r1 sweep): extraction 18.0 -> 16.3 ms/frame compute
    model = _build(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                           dtype='bfloat16')),
        test_cfg=dict(TEST_CFG))
    model.init_weights(input_shape=(1, 480, 854, 3))
    return model


def run_pass(model, videos):
    """One prefetch-overlapped pass over all videos (the production eval
    loop shape, apis/test.py single_process_test); returns seconds."""
    import concurrent.futures
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    t0 = time.time()
    pending = pool.submit(model.preload, videos[0][0])
    for i, (imgs, seg, meta) in enumerate(videos):
        handle = pending.result()
        if i + 1 < len(videos):
            pending = pool.submit(model.preload, videos[i + 1][0])
        preds = model.forward_test(handle, seg, [meta])
        preds[0][0].sum()
    pool.shutdown(wait=False)
    return time.time() - t0


def measure_compute_only(model, video, repeats=3):
    """Forward the same resident handle repeatedly: no host->device input
    transfer, so this isolates extraction+propagation+decode+readback."""
    imgs, seg, meta = video
    handle = model.preload(imgs)
    model.forward_test(handle, seg, [meta])  # ensure resident + compiled
    times = []
    for _ in range(repeats):
        t0 = time.time()
        model.forward_test(handle, seg, [meta])
        times.append(time.time() - t0)
    return statistics.median(times)


def measure_transfer(model, video, repeats=3):
    """Host->device link bandwidth through the production preload path."""
    import jax
    import jax.numpy as jnp
    imgs = video[0]
    force = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    _ = float(force(model.preload(imgs)[1]))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.time()
        handle = model.preload(imgs)
        float(force(handle[1]))  # reads every byte -> transfer complete
        times.append(time.time() - t0)
    return imgs.nbytes / statistics.median(times)


def check_backend_agreement(model, video):
    """Two gates: the fp32 pallas kernel must agree pixel-for-pixel with
    the independent tiled-XLA tier (kernel exactness), and the bf16-matmul
    production mode is reported against the fp32 kernel (its criterion is
    task quality — the fixture J&F gate — not pixel identity: bf16 input
    rounding legitimately flips near-tie argmaxes on noise videos)."""
    imgs, seg, meta = video
    short = imgs[:20]
    preds = {}
    for name, over in (('tiled', dict(backend='tiled')),
                       ('pallas', dict(backend='pallas',
                                       pallas_precision='float32')),
                       ('pallas_bf16', dict(backend='pallas'))):
        saved = dict(model.test_cfg)
        model.test_cfg.update(over)
        preds[name] = model.forward_test(short, seg, [meta])[0]
        model.test_cfg.clear()
        model.test_cfg.update(saved)
    exact = float((preds['pallas'] == preds['tiled']).mean())
    bf16 = float((preds['pallas_bf16'] == preds['pallas']).mean())
    return exact, bf16


def check_fixture_jf(model):
    """Propagation quality gate: mini-DAVIS moving-square fixture with the
    deterministic seed-0 weights. Catches semantic regressions in the
    extract/propagate/decode path that raw speed can't."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'tests'))
    from test_data.test_davis_e2e import VAL_PIPELINE, make_mini_davis
    from vfs_tpu.apis.test import single_process_test
    from vfs_tpu.datasets import build_dataset
    tmp = tempfile.mkdtemp()
    try:
        ann, img_root, ann_root = make_mini_davis(tmp, num_videos=2,
                                                  num_frames=6)
        dataset = build_dataset(dict(
            type='DavisDataset', ann_file=ann, data_prefix=img_root,
            anno_prefix=ann_root, data_root=tmp, pipeline=VAL_PIPELINE,
            test_mode=True))
        results = single_process_test(model, dataset, progress=False)
        metrics = dataset.evaluate(results, metrics='davis')
        return float(metrics['J&F-Mean'])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    model = build_model()
    videos = make_videos()
    total_frames = sum(v[0].shape[0] for v in videos)

    # correctness gates first (they also warm the fixture-shape compiles)
    agreement, bf16_agreement = check_backend_agreement(model, videos[0])
    assert agreement >= 0.999, \
        f'pallas/tiled backend disagreement: {agreement:.4f}'
    # fixture uses small shapes; separate tracker shapes compile quickly.
    # J&F runs with the production (bf16-matmul) config — the quality
    # gate for the approximation the timed passes use.
    jf = check_fixture_jf(model)
    assert jf >= 0.40, f'fixture J&F regression: {jf:.4f}'

    # warmup/compile every (T, H, W) bucket
    run_pass(model, videos)

    runs = int(os.environ.get('BENCH_RUNS', 5))
    pass_fps = []
    for _ in range(runs):
        dt = run_pass(model, videos)
        pass_fps.append(total_frames / dt)
    fps = statistics.median(pass_fps)

    compute_s = measure_compute_only(model, videos[0])
    compute_fps = videos[0][0].shape[0] / compute_s
    link_gbps = measure_transfer(model, videos[0]) / 1e9

    print(json.dumps({
        'metric': 'davis480p_label_propagation_fps_per_chip',
        'value': round(fps, 2),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(fps / CPU_BASELINE_FPS, 1),
        'extra': {
            'pass_fps_min': round(min(pass_fps), 2),
            'pass_fps_max': round(max(pass_fps), 2),
            'compute_only_fps': round(compute_fps, 2),
            'compute_ms_per_frame': round(1000 * compute_s /
                                          videos[0][0].shape[0], 2),
            'host_link_GBps': round(link_gbps, 3),
            'videos': [list(s) for s in VIDEO_SHAPES],
            'backend_agreement': round(agreement, 5),
            'bf16mm_vs_fp32_agreement': round(bf16_agreement, 5),
            'fixture_jf': round(jf, 4),
        },
    }))


if __name__ == '__main__':
    main()
