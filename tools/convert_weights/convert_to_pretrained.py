#!/usr/bin/env python
"""Convert checkpoints between layouts.

Modes (reference: tools/convert_weights/convert_to_pretrained.py:1-76):
  - ``torch->torch``: VFS training ckpt (backbone.* ConvModule names) ->
    torchvision ResNet key layout (the released-checkpoint format).
  - ``orbax->torch``: a native vfs_tpu train-state checkpoint -> torchvision
    .pth, so our pretrained backbones interoperate with the reference
    ecosystem.

Usage:
    python tools/convert_weights/convert_to_pretrained.py IN OUT \
        [--mode torch|orbax]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def orbax_state_to_torchvision(params, batch_stats):
    """flax ResNet tree -> torchvision-layout numpy state dict (inverse of
    vfs_tpu.checkpoint.torchvision_to_flax_resnet)."""
    import numpy as np
    out = {}

    def emit(flax_path, tv_conv, tv_bn):
        node_p = params
        node_s = batch_stats
        for k in flax_path:
            node_p = node_p[k]
            node_s = node_s[k]
        out[tv_conv + '.weight'] = np.transpose(
            np.asarray(node_p['conv']['kernel']), (3, 2, 0, 1))
        out[tv_bn + '.weight'] = np.asarray(node_p['bn']['scale'])
        out[tv_bn + '.bias'] = np.asarray(node_p['bn']['bias'])
        out[tv_bn + '.running_mean'] = np.asarray(node_s['bn']['mean'])
        out[tv_bn + '.running_var'] = np.asarray(node_s['bn']['var'])

    emit(['conv1'], 'conv1', 'bn1')
    for name in sorted(params):
        if not name.startswith('layer'):
            continue
        li, bi = name[len('layer'):].split('_')
        base = f'layer{li}.{bi}'
        block = params[name]
        for ci in (1, 2, 3):
            if f'conv{ci}' in block:
                emit([name, f'conv{ci}'], f'{base}.conv{ci}',
                     f'{base}.bn{ci}')
        if 'downsample' in block:
            emit([name, 'downsample'], f'{base}.downsample.0',
                 f'{base}.downsample.1')
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('src')
    parser.add_argument('dst')
    parser.add_argument('--mode', choices=['torch', 'orbax'],
                        default='torch')
    args = parser.parse_args()

    import torch

    if args.mode == 'torch':
        from vfs_tpu.checkpoint import (_load_state_dict,
                                        vfs_train_ckpt_to_torchvision)
        sd = _load_state_dict(args.src)
        out = vfs_train_ckpt_to_torchvision(sd)
        torch.save({k: torch.from_numpy(v) for k, v in out.items()},
                   args.dst)
    else:
        import jax
        jax.config.update('jax_platforms', 'cpu')
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(os.path.abspath(args.src))
        params = state['params']
        stats = state['batch_stats']
        # training state nests the backbone under the tracker module name
        for key in ('_backbone', 'backbone'):
            if key in params:
                params = params[key]
                stats = stats[key]
                break
        out = orbax_state_to_torchvision(params, stats)
        torch.save({k: torch.from_numpy(v) for k, v in out.items()},
                   args.dst)
    print(f'converted {args.src} -> {args.dst} ({args.mode})')


if __name__ == '__main__':
    main()
