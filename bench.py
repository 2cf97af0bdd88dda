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

# v5e bf16 peak (MXU); the backbone runs bf16 so extraction MFU is
# measured against this
PEAK_FLOPS_BF16 = 197e12

# pallas_precision='bfloat16': QK^T as one native MXU pass (fp32 is a
# 6-pass emulation) — 9.8 -> 6.8 ms/frame propagation, fixture-J&F
# neutral (0.5467 vs 0.5423). The agreement gate below still compares
# against the independent fp32 tiled tier, so the rounding is bounded.
# Per-depth protocols mirror the reference configs:
#   r18: configs/r18_nc_sgd_cos_100e_r2_1xNx8_k400.py (neighbor_range=24)
#   r50: configs/r50_nc_sgd_cos_100e_r5_1xNx2_k400.py:27-36
#        (neighbor_range=36, layer3 C=1024)
# input_format='yuv420': ship planar 4:2:0 (1.5 bytes/px) over the host
# link and reconstruct RGB inside the extraction jit (ops/yuv.py) — video
# sources are natively 4:2:0, so this is the decoder's own sampling, not
# an approximation the source didn't already have. Halves the upload,
# which is the e2e bottleneck on a tunneled host (1.23 MB/frame at
# host_link_GBps). Quality is gated by the same fixture J&F floor; the
# backend-agreement gates run on identical (yuv-transported) inputs.
TEST_CFGS = {
    18: dict(precede_frames=20, topk=10, temperature=0.07,
             strides=(1, 2, 1, 1), out_indices=(2,), neighbor_range=24,
             with_first=True, with_first_neighbor=True, batch_step=20,
             pallas_precision='bfloat16', input_format='yuv420'),
    50: dict(precede_frames=20, topk=10, temperature=0.07,
             strides=(1, 2, 1, 1), out_indices=(2,), neighbor_range=36,
             with_first=True, with_first_neighbor=True, batch_step=20,
             pallas_precision='bfloat16', input_format='yuv420'),
}
TEST_CFG = TEST_CFGS[18]

# Gate floors = known-good minus a small margin (VERDICT r3 #7 / r4 #4:
# bf16mm agreement measured 0.980 r18 / 0.989 r50 -> floors 0.97 / 0.98;
# fixture J&F known-goods on the round-4 fixture — 4 videos x 24 frames
# so the gate exercises ring wraparound (24 > P=20) — measured 0.5531
# r18 / 0.5227 r50 (BENCH_r04); pretrain known-good 34.1 steps/s).
GATES = {
    18: dict(fixture_jf=0.53, bf16_agreement=0.97),
    50: dict(fixture_jf=0.50, bf16_agreement=0.98),
    'pretrain_sps': 32.0,
    # tracking known-goods (round 5): device path box-identical to the
    # host path over 6x60-frame sequences (0.00 px after the cv2-bit-
    # replicating crop redesign); fps floor provisional pending the
    # batch-mode measurement
    'tracking': dict(fps=20.0, box_agreement_px=2.0, precision_20=0.95),
}

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


def build_model(depth=18):
    from vfs_tpu.models import build_model as _build
    # dtype='bfloat16' is the documented eval speed knob (fixture-J&F
    # neutral, r1 sweep): extraction 18.0 -> 16.3 ms/frame compute
    model = _build(
        dict(type='VanillaTracker',
             backbone=dict(type='ResNet', depth=depth, out_indices=(3,),
                           dtype='bfloat16')),
        test_cfg=dict(TEST_CFGS[depth]))
    model.init_weights(input_shape=(1, 480, 854, 3))
    return model


def run_pass(model, videos):
    """One prefetch-overlapped pass over all videos (the production eval
    loop shape, apis/test.py single_process_test); returns seconds."""
    import concurrent.futures
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    t0 = time.time()
    pending = pool.submit(model.preload, videos[0][0])
    prev_finish = None
    for i, (imgs, seg, meta) in enumerate(videos):
        handle = pending.result()
        if i + 1 < len(videos):
            pending = pool.submit(model.preload, videos[i + 1][0])
        # pipelined readback: dispatch this video's compute, then resolve
        # the previous video's link-bound prediction fetch
        finish = model.forward_test(handle, seg, [meta], defer_fetch=True)
        if prev_finish is not None:
            prev_finish()[0][0].sum()
        prev_finish = finish
    prev_finish()[0][0].sum()
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
    """Host->device link bandwidth through the production preload path
    (physical bytes: the yuv420 transport ships imgs.nbytes/2)."""
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
    return handle[1].nbytes / statistics.median(times)


def check_backend_agreement(model, video):
    """Two gates: the fp32 pallas kernel must agree pixel-for-pixel with
    the independent tiled-XLA tier (kernel exactness), and the bf16-matmul
    production mode is reported against the fp32 kernel (its criterion is
    task quality — the fixture J&F gate — not pixel identity: bf16 input
    rounding legitimately flips near-tie argmaxes on noise videos)."""
    imgs, seg, meta = video
    short = imgs[:20]
    # production backend for BOTH depths: the whole-video kernel —
    # protocols whose ring exceeds VMEM (r50 radius-18 C=1024) take the
    # bank-split passes automatically, so the gate tests exactly what
    # the timed passes run
    prod = 'pallas_video'
    preds = {}
    for name, over in (('tiled', dict(backend='tiled')),
                       ('pallas', dict(backend=prod,
                                       pallas_precision='float32')),
                       ('pallas_bf16', dict(backend=prod))):
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
    # on-device normalize keeps frames uint8 through the pipeline so the
    # gate exercises the production transport end-to-end — including the
    # yuv420 packing when test_cfg.input_format asks for it
    pipeline = [dict(step, on_device=True) if step['type'] == 'Normalize'
                else step for step in VAL_PIPELINE]
    tmp = tempfile.mkdtemp()
    try:
        # 4 videos x 24 frames: 24 > precede_frames=20 exercises ring
        # wraparound inside the gate (VERDICT r3 #7 — 6-frame videos
        # never filled the window)
        ann, img_root, ann_root = make_mini_davis(tmp, num_videos=4,
                                                  num_frames=24)
        dataset = build_dataset(dict(
            type='DavisDataset', ann_file=ann, data_prefix=img_root,
            anno_prefix=ann_root, data_root=tmp, pipeline=pipeline,
            test_mode=True))
        results = single_process_test(model, dataset, progress=False)
        metrics = dataset.evaluate(results, metrics='davis')
        return float(metrics['J&F-Mean'])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def measure_device_only(model, video, repeats=3):
    """Pure device pipeline (extraction + propagation + decode) with the
    bulk prediction readback excluded (forced by an on-device scalar sum)
    — the number a local-PCIe TPU-VM host would see; the delta vs
    ``compute_only`` is the host-link readback cost."""
    imgs, seg, meta = video
    handle = model.preload(imgs)
    finish = model.forward_test(handle, seg, [meta], defer_fetch='nocopy')
    if not hasattr(finish, 'seg_preds'):
        return None
    float(finish.seg_preds.sum())  # compiled + resident
    times = []
    for _ in range(repeats):
        t0 = time.time()
        finish = model.forward_test(handle, seg, [meta],
                                    defer_fetch='nocopy')
        float(finish.seg_preds.sum())
        times.append(time.time() - t0)
    return statistics.median(times)


def measure_extract_stage(model, video, repeats=3):
    """Extraction-stage ms/frame + exact FLOPs + MFU (VERDICT r2 weak #2:
    extraction is the larger half of compute — make its utilization a
    standing number). FLOPs come from XLA's own cost analysis of the
    compiled extraction graph."""
    import jax
    import jax.numpy as jnp
    imgs, seg, meta = video
    handle = model.preload(imgs)
    imgs_dev, t = handle[1], imgs.shape[0]
    yuv_hw = handle[3] if handle[0] == 'preloaded_yuv' else None
    batch_step = int(model.test_cfg.get('batch_step', 10))
    bulk_step = int(model.test_cfg.get('extract_bulk_step', 40))
    norm = meta['img_norm_cfg']
    mean = jnp.asarray(norm['mean'], jnp.float32)
    std = jnp.asarray(norm['std'], jnp.float32)
    variables = model._variables_for(imgs_dev)

    tiny = jax.jit(lambda x: x + 1)
    float(tiny(jnp.zeros(())))
    t0 = time.time()
    float(tiny(jnp.zeros(())))
    rtt = time.time() - t0

    feats = model._extract_feats(variables, imgs_dev, batch_step, mean, std,
                                 yuv_hw=yuv_hw, bulk_step=bulk_step)
    float(feats[0].sum())  # force (compile + residency)
    times = []
    for _ in range(repeats):
        t0 = time.time()
        feats = model._extract_feats(variables, imgs_dev, batch_step,
                                     mean, std, yuv_hw=yuv_hw,
                                     bulk_step=bulk_step)
        float(feats[0].sum())
        times.append(time.time() - t0)
    wall = max(statistics.median(times) - rtt, 1e-9)
    # jit binds self for __call__ but not for .lower — pass it explicitly
    cost = model._extract_feats.lower(
        model, variables, imgs_dev, batch_step, mean,
        std, yuv_hw=yuv_hw, bulk_step=bulk_step).compile().cost_analysis()
    # XLA cost analysis counts each lax.map BODY once (one bulk_step
    # chunk + one batch_step tail chunk when T % bulk_step != 0) —
    # per-frame = / the frames those counted bodies cover
    t_total = imgs_dev.shape[0]
    counted = (bulk_step + (batch_step if t_total % bulk_step else 0)
               if bulk_step and t_total >= bulk_step else batch_step)
    flops_pf = float(cost.get('flops', float('nan'))) / counted
    wall_pf = wall / imgs_dev.shape[0]
    return dict(
        extract_ms_per_frame=round(1000 * wall_pf, 2),
        extract_gflops_per_frame=round(flops_pf / 1e9, 1),
        extract_mfu=round(flops_pf / wall_pf / PEAK_FLOPS_BF16, 4))


def measure_propagation_stage(model, video, repeats=3):
    """Propagation-kernel ms/frame on RESIDENT features with the exact
    production PropagationConfig (VERDICT r3 #2: r50 needs per-stage
    accounting — extraction/propagation/decode split, not a remainder)."""
    import jax
    import jax.numpy as jnp
    from vfs_tpu.models.trackers.vanilla_tracker import (
        make_propagation_config)
    from vfs_tpu.ops.propagation import propagate_video
    from vfs_tpu.ops.resize import pil_nearest_resize
    imgs, seg, meta = video
    handle = model.preload(imgs)
    imgs_dev = handle[1]
    yuv_hw = handle[3] if handle[0] == 'preloaded_yuv' else None
    norm = meta['img_norm_cfg']
    feats = model._extract_feats(
        model._variables_for(imgs_dev), imgs_dev,
        int(model.test_cfg.get('batch_step', 10)),
        jnp.asarray(norm['mean'], jnp.float32),
        jnp.asarray(norm['std'], jnp.float32), yuv_hw=yuv_hw)[0]
    t, h, w = feats.shape[:3]
    resized = pil_nearest_resize(seg.astype(np.float32),
                                 (h, w)).astype(np.int64)
    k_pad = max(int(seg.max()) + 1, 2)
    k_pad = -(-k_pad // 4) * 4
    seg_first = jnp.asarray(np.eye(k_pad, dtype=np.float32)[resized])
    cfg, mask = make_propagation_config(model.test_cfg, h, w)

    tiny = jax.jit(lambda x: x + 1)
    float(tiny(jnp.zeros(())))
    t0 = time.time()
    float(tiny(jnp.zeros(())))
    rtt = time.time() - t0

    out = propagate_video(feats, seg_first, mask, cfg)
    float(out.sum())  # compile + resident
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = propagate_video(feats, seg_first, mask, cfg)
        float(out.sum())
        times.append(time.time() - t0)
    wall = max(statistics.median(times) - rtt, 1e-9)
    return round(1000 * wall / t, 2)


def measure_pretrain(steps=30):
    """Device-only SimSiam r18 pretrain step at the production workload
    (reference configs/r18_nc...py:107,139 — batch 32 x 2 clips x 4
    frames x 224^2, bf16 mixed precision): steps/s, frames/s, MFU, with
    gates so a mixed-precision or train-step regression FAILS the bench
    (VERDICT r3 weak #4 / next #5; known-good 33.5 steps/s, PROGRESS r3).
    """
    import jax
    import jax.numpy as jnp
    from vfs_tpu.apis.train import (apply_mixed_precision,
                                    create_train_state, make_train_step)
    from vfs_tpu.core.optimizer.builder import build_optimizer
    from vfs_tpu.models import build_model as _build
    from vfs_tpu.utils.config import Config

    cfg = Config.fromfile(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'configs', 'r18_nc_sgd_cos_100e_r2_1xNx8_k400.py'))
    cfg.bf16 = True
    assert apply_mixed_precision(cfg), 'bf16 rewrite did not engage'
    model = _build(cfg.model, train_cfg=cfg.get('train_cfg'))
    tx, _ = build_optimizer(cfg.optimizer, cfg.get('lr_config'), 1000,
                            100, None)
    rng = np.random.RandomState(0)
    # loader layout: channels-last (B, N clips, T, H, W, C)
    batch = {'imgs': rng.rand(32, 2, 4, 224, 224, 3).astype(np.float32)}
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    step_fn = jax.jit(make_train_step(model, tx, mixed_precision=True),
                      donate_argnums=(0,))
    imgs = jnp.asarray(batch['imgs'])
    frames_per_step = int(np.prod(imgs.shape[:3]))
    cost = step_fn.lower(state, imgs, None, None).compile().cost_analysis()
    state, log_vars = step_fn(state, imgs, None, None)
    loss0 = float(log_vars['loss'])
    t0 = time.time()
    for _ in range(steps):
        state, log_vars = step_fn(state, imgs, None, None)
    loss = float(log_vars['loss'])
    sps = steps / (time.time() - t0)
    assert np.isfinite(loss) and np.isfinite(loss0), \
        f'pretrain loss not finite: {loss0} -> {loss}'
    flops = float(cost.get('flops', float('nan')))
    return dict(steps_per_sec=round(sps, 1),
                frames_per_sec=round(sps * frames_per_step, 0),
                mfu=round(flops * sps / PEAK_FLOPS_BF16, 4),
                loss=round(loss, 4))


def measure_tracking(n_seqs=4, n_frames=50, hw=(360, 640), batch=2):
    """SiamFC tracking block (VERDICT r4 #3): fps for the production
    dev_batch2 composition (device crops + response post, 2 interleaved
    streams of track_batch) plus the host_seq parity anchor, on an
    OTB-layout moving-square fixture at real OTB frame size. Gated on
    (a) box agreement of the device path against the host-crop path
    (the differentially-parity-tested mode — the device resize is
    cv2-bit-replicating, see siamfc_tpu/device_crops.py), (b) OPE
    precision@20 of the device path against ground truth, and (c) a
    throughput floor, so a tracking regression FAILS the bench."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'projects', 'siamfc'))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.analysis.bench_track import make_fixture, run_mode

    from siamfc_tpu import eval_metrics
    from siamfc_tpu.otb import ExperimentOTB, _load_otb_seq

    root = os.path.join(tempfile.gettempdir(),
                        f'bench_tracking_{n_seqs}x{n_frames}')
    if not os.path.isdir(root):
        make_fixture(root, n_seqs, n_frames, hw)
    exp = ExperimentOTB(root, result_dir=os.path.join(root, 'res'),
                        report_dir=os.path.join(root, 'rep'))
    seqs = [_load_otb_seq(d) for d in exp.seq_dirs]
    pairs = [(f, a[0]) for f, a in seqs]
    host_fps, host_boxes = run_mode('host_seq', exp, pairs, batch)
    dev_fps, dev_boxes = run_mode('dev_batch2', exp, pairs, batch)
    box_dev = max(float(np.abs(dev_boxes[i] - host_boxes[i]).max())
                  for i in dev_boxes)
    prec = []
    for i, (_, anno) in enumerate(seqs):
        _, p = eval_metrics(dev_boxes[i], anno)
        prec.append(p[20])
    return dict(dev_batch2_fps=round(dev_fps, 1),
                host_seq_fps=round(host_fps, 1),
                box_agreement_px=round(box_dev, 2),
                precision_20=round(float(np.mean(prec)), 4))


def bench_depth(model, videos, runs, gates):
    """Gates + timed passes for one backbone depth; returns the stats."""
    total_frames = sum(v[0].shape[0] for v in videos)
    # correctness gates first (they also warm the fixture-shape compiles)
    agreement, bf16_agreement = check_backend_agreement(model, videos[0])
    assert agreement >= 0.999, \
        f'pallas/tiled backend disagreement: {agreement:.4f}'
    assert bf16_agreement >= gates['bf16_agreement'], \
        f'bf16mm drifted from fp32 kernel: {bf16_agreement:.4f}'
    # fixture uses small shapes; separate tracker shapes compile quickly.
    # J&F runs with the production (bf16-matmul) config — the quality
    # gate for the approximation the timed passes use.
    jf = check_fixture_jf(model)
    assert jf >= gates['fixture_jf'], f'fixture J&F regression: {jf:.4f}'

    # warmup/compile every (T, H, W) bucket
    run_pass(model, videos)
    pass_fps = []
    for _ in range(runs):
        dt = run_pass(model, videos)
        pass_fps.append(total_frames / dt)
    fps = statistics.median(pass_fps)
    compute_s = measure_compute_only(model, videos[0])
    device_s = measure_device_only(model, videos[0])
    t0 = videos[0][0].shape[0]
    # per-stage accounting for BOTH depths (VERDICT r3 #2): extraction
    # measured directly on resident data; propagation+decode is the
    # remainder of the device-only pipeline
    stages = measure_extract_stage(model, videos[0])
    stages['propagation_ms_per_frame'] = measure_propagation_stage(
        model, videos[0])
    device_ms = 1000 * device_s / t0 if device_s else None
    if device_ms is not None:
        stages['decode_readpack_ms_per_frame'] = round(
            device_ms - stages['extract_ms_per_frame']
            - stages['propagation_ms_per_frame'], 2)
    return dict(
        fps=fps, pass_fps=pass_fps,
        compute_fps=t0 / compute_s,
        compute_ms=1000 * compute_s / t0,
        device_fps=t0 / device_s if device_s else None,
        device_ms=device_ms,
        stages=stages,
        agreement=agreement, bf16_agreement=bf16_agreement, jf=jf)


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    videos = make_videos()

    # --- r18 headline (floors at known-good minus a small margin:
    # fixture J&F measured 0.5531 / bf16 agreement 0.980 on the round-4
    # kernel — a deliberate quality regression must FAIL here,
    # VERDICT r2 #6 / r4 #4) ---
    model = build_model(18)
    r18 = bench_depth(model, videos, int(os.environ.get('BENCH_RUNS', 5)),
                      gates=GATES[18])
    stages = r18['stages']
    link_gbps = measure_transfer(model, videos[0]) / 1e9
    del model

    # --- r50 protocol (reference r50_nc config: neighbor_range=36,
    # layer3 C=1024; second headline in BASELINE.md) ---
    r50_stats = None
    if os.environ.get('BENCH_R50', '1') != '0':
        model50 = build_model(50)
        r50 = bench_depth(model50, videos,
                          int(os.environ.get('BENCH_RUNS_R50', 3)),
                          gates=GATES[50])
        r50_stats = {
            'fps': round(r50['fps'], 2),
            'compute_only_fps': round(r50['compute_fps'], 2),
            'compute_ms_per_frame': round(r50['compute_ms'], 2),
            'device_only_fps': round(r50['device_fps'], 2)
            if r50['device_fps'] else None,
            'backend_agreement': round(r50['agreement'], 5),
            'bf16mm_vs_fp32_agreement': round(r50['bf16_agreement'], 5),
            'fixture_jf': round(r50['jf'], 4),
            **r50['stages'],
        }
        del model50

    pretrain = None
    if os.environ.get('BENCH_PRETRAIN', '1') != '0':
        pretrain = measure_pretrain()
        assert pretrain['steps_per_sec'] >= GATES['pretrain_sps'], \
            f'pretrain throughput regression: {pretrain}'

    tracking = None
    if os.environ.get('BENCH_TRACKING', '1') != '0':
        tracking = measure_tracking()
        g = GATES['tracking']
        assert tracking['dev_batch2_fps'] >= g['fps'], \
            f'tracking throughput regression: {tracking}'
        assert tracking['box_agreement_px'] <= g['box_agreement_px'], \
            f'device-crop path drifted from host path: {tracking}'
        assert tracking['precision_20'] >= g['precision_20'], \
            f'tracking quality regression: {tracking}'

    print(json.dumps({
        'metric': 'davis480p_label_propagation_fps_per_chip',
        'value': round(r18['fps'], 2),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(r18['fps'] / CPU_BASELINE_FPS, 1),
        'extra': {
            'pass_fps_min': round(min(r18['pass_fps']), 2),
            'pass_fps_max': round(max(r18['pass_fps']), 2),
            'compute_only_fps': round(r18['compute_fps'], 2),
            'compute_ms_per_frame': round(r18['compute_ms'], 2),
            'device_only_fps': round(r18['device_fps'], 2)
            if r18['device_fps'] else None,
            'device_ms_per_frame': round(r18['device_ms'], 2)
            if r18['device_ms'] else None,
            'host_link_GBps': round(link_gbps, 3),
            'videos': [list(s) for s in VIDEO_SHAPES],
            'backend_agreement': round(r18['agreement'], 5),
            'bf16mm_vs_fp32_agreement': round(r18['bf16_agreement'], 5),
            'fixture_jf': round(r18['jf'], 4),
            **stages,
            'r50': r50_stats,
            'pretrain': pretrain,
            'tracking': tracking,
            # the knobs the numbers were taken with (traceability)
            'config': {
                'backbone_dtype': 'bfloat16',
                'pallas_precision': TEST_CFG['pallas_precision'],
                'backend': 'pallas_video',
                'batch_step': TEST_CFG['batch_step'],
                # bits per label chosen per video from the class count
                # (1/2/4). The bench videos carry 8 classes -> 4-bit
                # labels, same bytes as round 2 (comparable headline);
                # real DAVIS-2017 videos mostly have <=4 classes and
                # ship 2-bit labels (half the readback).
                'packed_readback_bits': 'adaptive',
                'input_format': TEST_CFG.get('input_format', 'rgb'),
            },
        },
    }))


if __name__ == '__main__':
    main()
