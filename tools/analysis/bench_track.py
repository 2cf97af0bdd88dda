#!/usr/bin/env python
"""SiamFC tracking throughput A/B bench (OTB-style OPE loop).

Measures frames/sec for each composition of the tracking levers on a
synthetic OTB-layout fixture (moving-square sequences, realistic OTB
frame size), plus box agreement of every mode against the sequential
host-crop path — the mode that is differentially parity-tested against
the reference tracker (reference
projects/siamfc-pytorch/siamfc_tracker_base.py:245-319 drives one
sequence at a time with host cv2 crops).

Modes:
  host_seq    sequential loop, host cv2 crops + host response post
  dev_seq     sequential loop, device crops + on-device response post
  host_batch  track_batch(K): K sequences per dispatch, host crops
  dev_batch   track_batch(K) with device crops
  dev_batch2  dev_batch across 2 interleaved streams (the production
              composition in ExperimentOTB.run)

Usage:
    python tools/analysis/bench_track.py [--seqs 6] [--frames 60]
        [--hw 360 640] [--batch 3] [--modes host_seq dev_batch2 ...]
"""

import argparse
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), 'projects', 'siamfc'))


def parse_args():
    p = argparse.ArgumentParser(description='SiamFC tracking bench')
    p.add_argument('--seqs', type=int, default=6)
    p.add_argument('--frames', type=int, default=60)
    p.add_argument('--hw', type=int, nargs=2, default=(360, 640))
    p.add_argument('--batch', type=int, default=3,
                   help='sequences per dispatch in the batch modes')
    p.add_argument('--modes', nargs='*', default=None)
    p.add_argument('--root', default='/tmp/bench_track_fixture')
    return p.parse_args()


def make_fixture(root, n_seqs, n_frames, hw):
    """OTB-layout moving-square sequences; box size/motion scaled to the
    frame so the crop geometry (context margin, search region) matches
    real OTB magnitudes."""
    import cv2
    h, w = hw
    rng = np.random.RandomState(7)
    side = max(h // 6, 24)
    for s in range(n_seqs):
        seq = osp.join(root, f'Seq{s}', 'img')
        os.makedirs(seq, exist_ok=True)
        base = rng.randint(0, 60, (h, w, 3), np.uint8)
        color = rng.randint(140, 255, 3).tolist()
        x0, y0 = rng.randint(10, w // 3), rng.randint(10, h // 3)
        dx, dy = rng.randint(1, 4), rng.randint(1, 3)
        boxes = []
        for t in range(n_frames):
            img = base.copy()
            x = min(x0 + dx * t, w - side - 1)
            y = min(y0 + dy * t, h - side - 1)
            img[y:y + side, x:x + side] = color
            cv2.imwrite(osp.join(seq, f'{t + 1:04}.jpg'),
                        img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
            boxes.append([x + 1, y + 1, side, side])
        np.savetxt(osp.join(root, f'Seq{s}', 'groundtruth_rect.txt'),
                   np.array(boxes), fmt='%d', delimiter=',')


def build_tracker(device_crops):
    from siamfc_tpu.default_config import default_cfg
    from siamfc_tpu.tracker import TrackerSiamFC
    cfg = dict(default_cfg)
    cfg['model'] = {'backbone': dict(
        type='ResNet', depth=18, frozen_stages=4, dilations=(1, 1, 2, 4),
        strides=(1, 2, 1, 1), out_indices=(3,), norm_eval=True)}
    cfg['device_crops'] = device_crops
    tracker = TrackerSiamFC(cfg)
    tracker.init_weights()
    return tracker


def run_mode(mode, exp, pairs, batch):
    """Returns (fps over tracked frames excluding frame 0, boxes dict)."""
    tracker = build_tracker(device_crops=mode.startswith('dev'))
    # warm the compile caches on the first sequence outside the clock
    warm = ([pairs[0][0][:3]], [pairs[0][1]])
    if mode.endswith('seq'):
        tracker.track(warm[0][0], warm[1][0])
    else:
        tracker.track_batch(list(zip(*warm)), batch_size=batch)
    t0 = time.time()
    if mode.endswith('seq'):
        results = [tracker.track(f, b) for f, b in pairs]
    elif mode == 'dev_batch2':
        results = [None] * len(pairs)
        import concurrent.futures
        groups = [list(range(s, len(pairs), 2)) for s in range(2)]

        def worker(s):
            sub = tracker.track_batch([pairs[i] for i in groups[s]],
                                      batch_size=batch)
            for i, r in zip(groups[s], sub):
                results[i] = r
        with concurrent.futures.ThreadPoolExecutor(2) as pool:
            for f in [pool.submit(worker, s) for s in range(2)]:
                f.result()
    else:
        results = tracker.track_batch(pairs, batch_size=batch)
    wall = time.time() - t0
    frames = sum(len(f) - 1 for f, _ in pairs)
    boxes = {i: r[0] for i, r in enumerate(results)}
    return frames / wall, boxes


def main():
    args = parse_args()
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    from siamfc_tpu.otb import ExperimentOTB, _load_otb_seq

    if not osp.isdir(args.root):
        make_fixture(args.root, args.seqs, args.frames, tuple(args.hw))
    exp = ExperimentOTB(args.root, result_dir='/tmp/bench_track_results',
                        report_dir='/tmp/bench_track_reports')
    seqs = [_load_otb_seq(d) for d in exp.seq_dirs]
    pairs = [(f, a[0]) for f, a in seqs]

    modes = args.modes or ['host_seq', 'dev_seq', 'host_batch',
                           'dev_batch', 'dev_batch2']
    ref_boxes = None
    print(f'{args.seqs} seqs x {args.frames} frames @ {tuple(args.hw)}, '
          f'batch={args.batch}')
    for mode in modes:
        fps, boxes = run_mode(mode, exp, pairs, args.batch)
        if mode == 'host_seq':
            ref_boxes = boxes
        dev = None
        if ref_boxes is not None and mode != 'host_seq':
            dev = max(float(np.abs(boxes[i] - ref_boxes[i]).max())
                      for i in boxes)
        dev_s = f'  max|box - host_seq| = {dev:.2f} px' if dev is not None \
            else ''
        print(f'{mode:<11} {fps:7.1f} fps{dev_s}')


if __name__ == '__main__':
    main()
