#!/usr/bin/env python
"""Pretraining throughput proof: synthetic-K400 SimSiam steps/sec on TPU.

SURVEY §7 lists host decode throughput as the pretraining starve risk
(the reference feeds 32 vids/GPU with 16 decord workers). This tool
measures the three rates that decide it, on the real config pipeline
with fake .mp4 videos:

  1. loader-only samples/sec (decode + augment + collate, no device),
  2. device-only steps/sec (one resident batch, jitted train step),
  3. end-to-end steps/sec (loader feeding the device).

Not input-starved ⇔ (1) >= batch * (2), in which case (3) ≈ (2).

Usage:
    python tools/analysis/bench_pretrain.py [CONFIG] [--steps 20]
        [--batch-size 32] [--workers 16] [--num-videos 16] [--profile DIR]
"""

import argparse
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))

DEFAULT_CONFIG = osp.join(
    osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
    'configs', 'r18_nc_sgd_cos_100e_r2_1xNx8_k400.py')


def parse_args():
    parser = argparse.ArgumentParser(description='Pretrain throughput')
    parser.add_argument('config', nargs='?', default=DEFAULT_CONFIG)
    parser.add_argument('--steps', type=int, default=20)
    parser.add_argument('--batch-size', type=int, default=None,
                        help='default: cfg.data.videos_per_gpu')
    parser.add_argument('--workers', type=int, default=None,
                        help='default: cfg.data.workers_per_gpu')
    parser.add_argument('--num-videos', type=int, default=None,
                        help='default: 2 * batch size')
    parser.add_argument('--video-frames', type=int, default=100)
    parser.add_argument('--video-hw', type=int, nargs=2,
                        default=(256, 340))
    parser.add_argument('--data-dir', default=None,
                        help='reuse an existing fake-video dir')
    parser.add_argument('--profile', default=None, metavar='DIR',
                        help='capture a jax.profiler trace of the '
                             'end-to-end phase')
    parser.add_argument('--bf16', action='store_true',
                        help='bf16 mixed precision (the production '
                             'fp16=dict() config path): bf16 backbone '
                             'compute, fp32 master params/BN')
    parser.add_argument('--device-aug', action='store_true',
                        help='move the augmentation chain onto the TPU '
                             '(ops/device_aug): the host only decodes + '
                             'resizes to --staging')
    parser.add_argument('--staging', type=int, nargs=2, default=(256, 320),
                        metavar=('H', 'W'),
                        help='uint8 staging size shipped to the device '
                             'in --device-aug mode')
    return parser.parse_args()


# transform types the device chain supports (ops/device_aug.py)
_DEVICE_AUG_TYPES = ('RandomResizedCrop', 'Resize', 'Flip', 'ColorJitter',
                     'RandomGrayScale', 'RandomGaussianBlur')


def split_device_aug_pipeline(pipeline, staging):
    """Split a host train pipeline at the first device-supported aug
    transform: everything before it stays on the host (in order), from
    there on every transform must be device-supported or terminal
    (Normalize/FormatShape/Collect/ToTensor) — an interleaved host-only
    transform would silently reorder augmentation semantics, so it
    raises instead. A keep_ratio Resize is host prep, not a device op.
    Returns (host_pipeline, device_transforms)."""
    def is_device_op(t):
        typ = t['type']
        if typ not in _DEVICE_AUG_TYPES:
            return False
        if typ == 'Resize' and t.get('keep_ratio', True):
            return False  # short-side host prep resize
        return True

    if any(t['type'] == 'DeviceAug' for t in pipeline):
        # already a device-aug pipeline (e.g. the *_deviceaug config):
        # splitting again would stack a second DeviceAug onto 5-D arrays
        return [dict(t) for t in pipeline], None

    host, device = [], []
    in_device = False
    for t in pipeline:
        typ = t['type']
        if not in_device:
            if is_device_op(t):
                in_device = True
                device.append(dict(t))
            elif typ in ('Normalize', 'FormatShape', 'Collect',
                         'ToTensor'):
                continue  # replaced by DeviceAug + device normalize
            else:
                host.append(dict(t))
        else:
            if is_device_op(t):
                device.append(dict(t))
            elif typ in ('Normalize', 'FormatShape', 'Collect',
                         'ToTensor'):
                continue
            else:
                raise ValueError(
                    f'--device-aug cannot move {typ!r} onto the device '
                    f'and it appears AFTER device-side transforms — '
                    f'reorder the pipeline or drop --device-aug')
    host.append(dict(type='DeviceAug', scale=(staging[1], staging[0])))
    host.append(dict(type='Collect', keys=['imgs', 'label', 'orig_hw'],
                     meta_keys=()))
    return host, device


def make_fake_k400(root, num_videos, num_frames, hw):
    """Random-noise .mp4s + a video list (K400 layout)."""
    import cv2
    os.makedirs(root, exist_ok=True)
    ann = osp.join(root, 'train_list.txt')
    if osp.isfile(ann):
        return ann
    h, w = hw
    rng = np.random.RandomState(0)
    lines = []
    for v in range(num_videos):
        name = f'fake_{v:03d}.mp4'
        writer = cv2.VideoWriter(
            osp.join(root, name), cv2.VideoWriter_fourcc(*'mp4v'),
            30, (w, h))
        base = rng.randint(0, 255, (h, w, 3), np.uint8)
        for t in range(num_frames):
            frame = np.roll(base, 3 * t, axis=1)
            writer.write(frame)
        writer.release()
        lines.append(f'{name} {v % 4}\n')
    with open(ann, 'w') as f:
        f.writelines(lines)
    return ann


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    from vfs_tpu.apis.train import create_train_state, make_train_step
    from vfs_tpu.core.optimizer.builder import build_optimizer
    from vfs_tpu.datasets import build_dataloader, build_dataset
    from vfs_tpu.models import build_model
    from vfs_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    batch = args.batch_size or cfg.data['videos_per_gpu']
    workers = args.workers or cfg.data['workers_per_gpu']

    num_videos = args.num_videos or 2 * batch
    data_dir = args.data_dir or f'/tmp/vfs_tpu_fake_k400_{num_videos}'
    ann = make_fake_k400(data_dir, num_videos, args.video_frames,
                         tuple(args.video_hw))

    train_cfg = dict(cfg.data['train'])
    inner = dict(train_cfg.get('dataset', train_cfg))
    inner.update(ann_file=ann, data_prefix=data_dir)
    device_aug_fn = None
    if args.device_aug:
        from vfs_tpu.ops.device_aug import build_device_aug
        host_pipe, dev_transforms = split_device_aug_pipeline(
            inner['pipeline'], tuple(args.staging))
        inner['pipeline'] = host_pipe
        if dev_transforms is None:  # config already split (device_aug key)
            dev_transforms = cfg.device_aug['transforms']
        device_aug_fn = build_device_aug(dev_transforms, cfg.img_norm_cfg)
        print(f'device-aug: {len(dev_transforms)} transforms on TPU, '
              f'staging {tuple(args.staging)} uint8')
    dataset = build_dataset(inner)
    loader = build_dataloader(dataset, videos_per_gpu=batch,
                              workers_per_gpu=workers, shuffle=True,
                              drop_last=True, seed=0)

    # 1) loader-only: samples/sec through decode+augment+collate
    it = iter(loader)
    first = next(it)  # absorb worker spin-up
    n_batches = max(2, min(len(loader) - 1, args.steps))
    t0 = time.time()
    got = 0
    for _ in range(n_batches):
        b = next(it, None)
        if b is None:
            it = iter(loader)
            b = next(it)
        got += b['imgs'].shape[0]
    loader_sps = got / (time.time() - t0)

    # 2) device-only: jitted SimSiam train step on one resident batch
    if args.bf16:
        from vfs_tpu.apis.train import apply_mixed_precision
        cfg.bf16 = True
        assert apply_mixed_precision(cfg)
        print('bf16 mixed precision: backbone compute bf16, '
              'fp32 master params/BN')
    model = build_model(cfg.model, train_cfg=cfg.get('train_cfg'))
    tx, _ = build_optimizer(cfg.optimizer, cfg.get('lr_config'),
                            1000, 100, None)
    state = create_train_state(
        model, jax.random.PRNGKey(0), first, tx,
        aug_out_hw=device_aug_fn.out_hw if device_aug_fn else None)
    train_step = jax.jit(make_train_step(model, tx,
                                         mixed_precision=args.bf16,
                                         device_aug=device_aug_fn),
                         donate_argnums=(0,))
    imgs_dev = jnp.asarray(first['imgs'])
    hw_dev = jnp.asarray(first['orig_hw']) if device_aug_fn else None
    state, log_vars = train_step(state, imgs_dev, None, hw_dev)  # compile
    float(log_vars['loss'])
    t0 = time.time()
    for _ in range(args.steps):
        state, log_vars = train_step(state, imgs_dev, None, hw_dev)
    float(log_vars['loss'])  # force completion of the queue
    device_sps = args.steps / (time.time() - t0)

    # 3) end-to-end: loader feeds the device
    if args.profile:
        jax.profiler.start_trace(args.profile)
    it = iter(loader)
    t0 = time.time()
    steps = 0
    fetch_blocked = 0.0
    while steps < args.steps:
        tf = time.time()
        b = next(it, None)
        if b is None:
            it = iter(loader)
            b = next(it)
        fetch_blocked += time.time() - tf
        hw_b = jnp.asarray(b['orig_hw']) if device_aug_fn else None
        state, log_vars = train_step(state, jnp.asarray(b['imgs']), None,
                                     hw_b)
        steps += 1
    float(log_vars['loss'])
    e2e_time = time.time() - t0
    if args.profile:
        jax.profiler.stop_trace()
    e2e_sps = steps / e2e_time

    clips, clip_len = first['imgs'].shape[1], first['imgs'].shape[2]
    frames_per_step = batch * clips * clip_len
    print(f'config: batch={batch} workers={workers} '
          f'imgs/step={frames_per_step} ({clips} clips x {clip_len} '
          f'frames x {batch} videos) shape={tuple(first["imgs"].shape)}')
    print(f'loader-only:  {loader_sps:.2f} samples/s '
          f'({loader_sps / batch:.3f} equivalent steps/s)')
    print(f'device-only:  {device_sps:.3f} steps/s '
          f'({device_sps * frames_per_step:.0f} frames/s)')
    print(f'end-to-end:   {e2e_sps:.3f} steps/s '
          f'({e2e_sps * frames_per_step:.0f} frames/s), '
          f'loader-blocked {100 * fetch_blocked / e2e_time:.1f}% of wall')
    starved = loader_sps < device_sps * batch
    print('input-starved:', 'YES — raise workers or decode size'
          if starved else 'no (loader outruns the device)')


if __name__ == '__main__':
    main()
