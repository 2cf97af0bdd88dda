#!/usr/bin/env python
"""Train CLI (reference: tools/train.py:20-181).

Usage:
    python tools/train.py CONFIG [--work-dir D] [--seed N] [--options k=v]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args():
    parser = argparse.ArgumentParser(description='Train a model')
    parser.add_argument('config', help='config file path')
    parser.add_argument('--work-dir', help='dir to save logs and ckpts')
    parser.add_argument('--resume-from', help='checkpoint to resume from')
    parser.add_argument('--auto-resume', action='store_true',
                        help='resume from latest checkpoint in work_dir')
    parser.add_argument('--seed', type=int, default=0, help='random seed')
    parser.add_argument('--validate', action='store_true',
                        help='run the propagation eval each epoch (the '
                             'reference wires this but hard-codes it off, '
                             'tools/train.py:175)')
    parser.add_argument('--local-devices', default='1',
                        help="chips to shard --validate eval over: a "
                             "count or 'all' (reference DistEvalHook "
                             "parity, eval_hooks.py:135)")
    parser.add_argument('--launcher', default='none',
                        choices=['none', 'jax'],
                        help='multi-host launcher')
    parser.add_argument('--options', nargs='+', default=None,
                        help='dotted-key config overrides k=v')
    parser.add_argument('--suffix', default=None,
                        help='appended to work_dir (and the wandb dir, '
                             'if configured)')
    parser.add_argument('--disable-wandb', action='store_true',
                        help='drop any WandbLoggerHook from log_config')
    parser.add_argument('--profile', type=int, default=0, metavar='N',
                        help='capture a jax.profiler trace of train steps '
                             '[2, 2+N) to WORK_DIR/profile (view with '
                             'tensorboard or xprof)')
    parser.add_argument('--compilation-cache',
                        default='/tmp/vfs_tpu_xla_cache')
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    if args.compilation_cache:
        jax.config.update('jax_compilation_cache_dir', args.compilation_cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    from vfs_tpu.apis.train import apply_mixed_precision, train_model
    from vfs_tpu.datasets import build_dataset
    from vfs_tpu.models import build_model
    from vfs_tpu.parallel import init_dist
    from vfs_tpu.utils import (Config, collect_env, get_root_logger,
                               parse_options, set_random_seed)

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_dict(parse_options(args.options))

    if args.work_dir:
        cfg.work_dir = args.work_dir
    elif 'work_dir' not in cfg:
        cfg.work_dir = os.path.join(
            './work_dirs', os.path.splitext(os.path.basename(args.config))[0])
    if args.suffix is not None:
        cfg.work_dir = f'{cfg.work_dir}-{args.suffix}'
    # wandb hook manipulation (reference tools/train.py:89-98)
    hooks = (cfg.get('log_config') or {}).get('hooks', []) or []
    for i, h in enumerate(list(hooks)):
        if isinstance(h, dict) and h.get('type') == 'WandbLoggerHook':
            if args.disable_wandb:
                hooks.pop(i)
                break
            wdir = h.get('init_kwargs', {}).get('dir')
            if args.suffix is not None and wdir:
                h['init_kwargs']['dir'] = f'{wdir}-{args.suffix}'
    cfg.seed = args.seed
    cfg.profile_steps = args.profile
    cfg.auto_resume = args.auto_resume

    init_dist(None if args.launcher == 'none' else args.launcher)

    os.makedirs(cfg.work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(cfg.work_dir, 'train.log'))
    env = collect_env()
    logger.info('Environment:\n' + '\n'.join(
        f'{k}: {v}' for k, v in env.items()))
    logger.info(f'Config: {args.config}')
    cfg.dump(os.path.join(cfg.work_dir, os.path.basename(args.config)))

    set_random_seed(args.seed)

    apply_mixed_precision(cfg)
    model = build_model(cfg.model, train_cfg=cfg.get('train_cfg'),
                        test_cfg=cfg.get('test_cfg'))
    dataset = build_dataset(cfg.data.train)
    logger.info(f'Start training: {len(dataset)} samples, '
                f'{cfg.total_epochs} epochs')
    from vfs_tpu.apis.train_localizer import (LOCALIZER_TYPES,
                                              train_localizer_model)
    if cfg.model.get('type') in LOCALIZER_TYPES:
        if args.local_devices != '1':
            logger.info('--local-devices: localizer validation computes a '
                        'mesh-sharded val loss; per-chip eval sharding '
                        'does not apply')
        train_localizer_model(model, dataset, cfg, validate=args.validate,
                              logger=logger)
    else:
        eval_devs = None
        if args.validate and args.local_devices != '1':
            ndev = len(jax.local_devices()) if args.local_devices == 'all' \
                else int(args.local_devices)
            if ndev > 1:
                eval_devs = jax.local_devices()[:ndev]
                logger.info(
                    f'validation sharded over {len(eval_devs)} chips')
        train_model(model, dataset, cfg, validate=args.validate,
                    logger=logger, local_devices=eval_devs)


if __name__ == '__main__':
    main()
