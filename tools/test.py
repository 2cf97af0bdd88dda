#!/usr/bin/env python
"""Eval CLI (reference: tools/test.py:17-166).

Rebuilds the model as a VanillaTracker from ``cfg.model.backbone`` with the
test_cfg strides/out_indices and a (torch-layout) checkpoint, runs the
dataset, and calls ``dataset.evaluate`` (reference :129-133,158-166).

Usage:
    python tools/test.py CONFIG CHECKPOINT --eval davis [--options k=v ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args():
    parser = argparse.ArgumentParser(description='Test a tracker')
    parser.add_argument('config', help='config file path')
    parser.add_argument('checkpoint', help='checkpoint (.pth torch layout)')
    parser.add_argument('--eval', nargs='+', default=['davis'],
                        help='metrics, e.g. davis')
    parser.add_argument('--options', nargs='+', default=None,
                        help='dotted-key config overrides k=v')
    parser.add_argument('--output-dir', default=None,
                        help='dir to save palette PNG predictions')
    parser.add_argument('--out', default=None, help='save raw results (.npz)')
    def _ndev(v):
        if v != 'all' and not v.isdigit():
            raise argparse.ArgumentTypeError(
                f"--local-devices must be a positive integer or 'all', "
                f"got {v!r}")
        return v

    parser.add_argument('--local-devices', default='1', type=_ndev,
                        help="round-robin videos over N local chips "
                             "('all' = every local device); one worker "
                             "thread per chip")
    parser.add_argument('--compilation-cache', default='/tmp/vfs_tpu_xla_cache')
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    if args.compilation_cache:
        jax.config.update('jax_compilation_cache_dir', args.compilation_cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    import numpy as np

    from vfs_tpu.apis import multi_process_test
    from vfs_tpu.datasets import build_dataset
    from vfs_tpu.models import build_model
    from vfs_tpu.utils import Config, get_root_logger, parse_options

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_dict(parse_options(args.options))

    logger = get_root_logger()
    dataset = build_dataset(cfg.data.test, dict(test_mode=True))

    # rebuild as VanillaTracker with eval strides (reference tools/test.py:129)
    model_cfg = dict(type='VanillaTracker', backbone=dict(cfg.model.backbone))
    model_cfg['backbone']['pretrained'] = args.checkpoint
    model = build_model(model_cfg, test_cfg=cfg.test_cfg)
    model.init_weights()

    ndev = len(jax.local_devices()) if args.local_devices == 'all' \
        else int(args.local_devices)
    if ndev > 1 and jax.process_count() == 1:
        from vfs_tpu.apis import single_process_test
        devs = jax.local_devices()[:ndev]
        logger.info(f'evaluating over {len(devs)} local devices')
        results = single_process_test(model, dataset, devices=devs)
    else:
        results = multi_process_test(model, dataset)

    if args.out and jax.process_index() == 0:
        np.savez(args.out, *[np.asarray(r) for r in results])
        logger.info(f'raw results saved to {args.out}')

    if jax.process_index() == 0:
        eval_results = dataset.evaluate(results, metrics=args.eval,
                                        output_dir=args.output_dir)
        for name, val in eval_results.items():
            print(f'{name}: {val:.04f}')


if __name__ == '__main__':
    main()
