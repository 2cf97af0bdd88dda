"""Checkpoint IO: orbax for native state, torch-.pth bridges for the
reference's released weights.

Three reference checkpoint layouts exist (SURVEY §5 "Checkpoint / resume"):
  (a) VFS training ckpt: ``backbone.conv1.conv.weight`` ConvModule naming
      (+ head + optimizer states);
  (b) torchvision-style backbone-only (``conv1.weight``,
      ``layerX.Y.convN`` / ``bnN`` / ``downsample.0/1``) — the format the
      released checkpoints use and ``tools/test.py`` consumes (reference
      mmaction/models/backbones/resnet.py:488-523,
      tools/convert_weights/convert_to_pretrained.py:7-64);
  (c) SiamFC full-net ckpt.

``load_torchvision_resnet`` maps (b) into the flax ResNet parameter tree
(vfs_tpu.models.backbones.resnet naming: ``layer{X}_{Y}`` modules with
``conv{n}/bn{n}/downsample`` ConvBN children). ``vfs_train_ckpt_to_
torchvision`` replicates the reference converter for (a)->(b).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# torch .pth bridges (host-side, numpy only beyond torch.load)
# ---------------------------------------------------------------------------

def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(ckpt, dict) and 'state_dict' in ckpt:
        ckpt = ckpt['state_dict']
    return {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
            for k, v in ckpt.items()}


def vfs_train_ckpt_to_torchvision(
        state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """(a) -> (b): strip ``backbone.`` ConvModule naming into torchvision
    keys (parity with reference tools/convert_weights/
    convert_to_pretrained.py:7-64)."""
    out = {}
    for key, value in state_dict.items():
        if not key.startswith('backbone.'):
            continue
        name = key[len('backbone.'):]
        # conv1.conv.weight -> conv1.weight ; conv1.bn.* -> bn1.*
        if name.startswith('conv1.conv.'):
            out['conv1.' + name[len('conv1.conv.'):]] = value
        elif name.startswith('conv1.bn.'):
            out['bn1.' + name[len('conv1.bn.'):]] = value
        else:
            # layerX.Y.convN.conv.* -> layerX.Y.convN.*
            # layerX.Y.convN.bn.*   -> layerX.Y.bnN.*
            # layerX.Y.downsample.conv.* -> layerX.Y.downsample.0.*
            # layerX.Y.downsample.bn.*   -> layerX.Y.downsample.1.*
            m = re.match(r'(layer\d+\.\d+)\.(conv\d|downsample)\.'
                         r'(conv|bn)\.(.+)', name)
            if m is None:
                continue
            prefix, mod, sub, rest = m.groups()
            if mod == 'downsample':
                idx = '0' if sub == 'conv' else '1'
                out[f'{prefix}.downsample.{idx}.{rest}'] = value
            else:
                if sub == 'conv':
                    out[f'{prefix}.{mod}.{rest}'] = value
                else:
                    out[f'{prefix}.bn{mod[len("conv"):]}.{rest}'] = value
    return out


def torchvision_to_flax_resnet(
        state_dict: Dict[str, np.ndarray],
        dtype: Any = np.float32) -> Tuple[Dict, Dict]:
    """(b) -> flax variables: returns ``(params, batch_stats)`` trees
    matching ``vfs_tpu.models.backbones.resnet.ResNet``.

    Conv kernels transpose OIHW -> HWIO (torch -> flax NHWC).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def convbn_paths(tv_conv: str, tv_bn: str, flax_path):
        w = state_dict[tv_conv + '.weight']
        put(params, flax_path + ['conv', 'kernel'],
            np.transpose(w, (2, 3, 1, 0)).astype(dtype))
        put(params, flax_path + ['bn', 'scale'],
            state_dict[tv_bn + '.weight'].astype(dtype))
        put(params, flax_path + ['bn', 'bias'],
            state_dict[tv_bn + '.bias'].astype(dtype))
        put(stats, flax_path + ['bn', 'mean'],
            state_dict[tv_bn + '.running_mean'].astype(dtype))
        put(stats, flax_path + ['bn', 'var'],
            state_dict[tv_bn + '.running_var'].astype(dtype))

    convbn_paths('conv1', 'bn1', ['conv1'])

    # discover layers/blocks from keys
    block_ids = sorted({
        (int(m.group(1)), int(m.group(2)))
        for k in state_dict
        for m in [re.match(r'layer(\d+)\.(\d+)\.', k)] if m
    })
    for (li, bi) in block_ids:
        base = f'layer{li}.{bi}'
        flax_base = [f'layer{li}_{bi}']
        n_convs = 3 if f'{base}.conv3.weight' in state_dict else 2
        for ci in range(1, n_convs + 1):
            convbn_paths(f'{base}.conv{ci}', f'{base}.bn{ci}',
                         flax_base + [f'conv{ci}'])
        if f'{base}.downsample.0.weight' in state_dict:
            convbn_paths(f'{base}.downsample.0', f'{base}.downsample.1',
                         flax_base + ['downsample'])
    return params, stats


def load_torchvision_resnet(path: str,
                            dtype: Any = np.float32) -> Tuple[Dict, Dict]:
    """Load a released/torchvision-layout .pth into flax (params,
    batch_stats) trees."""
    sd = _load_state_dict(path)
    if any(k.startswith('backbone.') for k in sd):
        sd = vfs_train_ckpt_to_torchvision(sd)
    return torchvision_to_flax_resnet(sd, dtype=dtype)


# ---------------------------------------------------------------------------
# orbax native checkpointing (train state save / resume)
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    keep: int = 100) -> str:
    """Save a pytree train state under ``ckpt_dir/step_{N}`` and refresh the
    ``latest`` pointer (reference auto-resume reads work_dirs/latest.pth,
    tools/train.py:103-105)."""
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f'step_{step}')
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, 'latest'), 'w') as f:
        f.write(f'step_{step}')
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    marker = os.path.join(ckpt_dir, 'latest')
    if not os.path.isfile(marker):
        return None
    with open(marker) as f:
        name = f.read().strip()
    path = os.path.join(ckpt_dir, name)
    return path if os.path.isdir(path) else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by ``save_checkpoint`` (``target`` provides
    structure/shapes)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)
