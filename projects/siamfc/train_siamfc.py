#!/usr/bin/env python
"""SiamFC train + OTB eval CLI (reference: projects/siamfc-pytorch/
train_siamfc.py:46-177).

Usage:
    python projects/siamfc/train_siamfc.py CONFIG \
        [--pretrained BACKBONE.pth] [--got10k-root D] [--otb-root D] \
        [--options k=v ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    parser = argparse.ArgumentParser(description='Train/eval SiamFC')
    parser.add_argument('config', help='VFS config (for backbone cfg)')
    parser.add_argument('--pretrained', default=None,
                        help='backbone checkpoint (.pth torch layout)')
    parser.add_argument('--checkpoint', default=None,
                        help='full tracker orbax checkpoint to restore')
    parser.add_argument('--got10k-root', default=None,
                        help='GOT-10k-style train sequences for probing')
    parser.add_argument('--otb-root', default='data/otb',
                        help='OTB dataset root')
    parser.add_argument('--work-dir', default='./work_dirs/siamfc')
    parser.add_argument('--options', nargs='+', default=None)
    parser.add_argument('--local-devices', default='1',
                        help="track OTB sequences over N local chips "
                             "('all' = every local device)")
    parser.add_argument('--track-batch', type=int, default=1,
                        help='track K sequences per device dispatch '
                             '(amortizes dispatch RTT K-fold)')
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    # persistent XLA cache: tracking compiles one graph per (K, scales)
    # crop-batch shape — without the cache every CLI invocation repays
    # ~60 s of compile before the first tracked frame
    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    from siamfc_tpu import (ExperimentOTB, SequenceDataset, TrackerSiamFC,
                            default_cfg)

    from vfs_tpu.utils import Config, get_root_logger, parse_options

    logger = get_root_logger()
    cfg = dict(default_cfg)
    vfs_cfg = Config.fromfile(args.config)
    # merge the VFS config's backbone depth/channels (reference :49-50)
    backbone = dict(cfg['model']['backbone'])
    backbone['depth'] = vfs_cfg.model.backbone.depth
    cfg['model'] = {'backbone': backbone}
    if backbone['depth'] >= 50:
        cfg['out_channels'] = 2048
        cfg['out_scale'] = 1e-5
    if args.options:
        for k, v in parse_options(args.options).items():
            cfg[k] = v

    tracker = TrackerSiamFC(cfg, logger)
    tracker.init_weights(pretrained=args.pretrained)
    if args.checkpoint:
        from vfs_tpu.checkpoint import restore_checkpoint
        tracker.variables = restore_checkpoint(args.checkpoint,
                                               tracker.variables)

    if args.pretrained and args.got10k_root and (
            cfg['model']['backbone'].get('frozen_stages', -1) >= 0
            or cfg['extra_conv']):
        seqs = SequenceDataset(args.got10k_root)
        logger.info(f'linear probing on {len(seqs)} sequences')
        tracker.train_over(seqs, work_dir=args.work_dir)

    if os.path.isdir(args.otb_root):
        exp = ExperimentOTB(
            args.otb_root, version=2015,
            result_dir=os.path.join(args.work_dir, 'results'),
            report_dir=os.path.join(args.work_dir, 'reports'))
        logger.info(f'running OTB OPE on {len(exp.seq_names)} sequences')
        import jax
        ndev = len(jax.local_devices()) if args.local_devices == 'all' \
            else int(args.local_devices)
        devs = jax.local_devices()[:ndev] if ndev > 1 else None
        boxes = exp.run(tracker, devices=devs,
                        batch_size=args.track_batch)
        report = exp.report(boxes)
        logger.info(
            f"Results copypaste  {report['precision_score']*100:.1f}"
            f",{report['success_score']*100:.1f}")
        print(f"precision: {report['precision_score']:.4f} "
              f"success: {report['success_score']:.4f} "
              f"speed: {report['speed_fps']}")
    else:
        logger.info(f'OTB root {args.otb_root} not found; skipping eval')


if __name__ == '__main__':
    main()
