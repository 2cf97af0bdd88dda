"""ResNet-TSM: 2-D ResNet with temporal shift (Flax).

Reference: mmaction/models/backbones/resnet_tsm.py:40-294 (TemporalShift
wraps each residual block's first conv: 1/shift_div of channels shift
left, 1/shift_div shift right along time, zero-padded).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES
from .resnet import ARCH_SETTINGS, ConvBN, max_pool_3x3_s2


def temporal_shift(x: jnp.ndarray, num_segments: int,
                   shift_div: int = 8) -> jnp.ndarray:
    """(N*T, H, W, C) -> shifted along T (reference resnet_tsm.py:125-160,
    zero padding at clip edges)."""
    nt, h, w, c = x.shape
    n = nt // num_segments
    x = x.reshape(n, num_segments, h, w, c)
    fold = c // shift_div
    left = jnp.concatenate(
        [x[:, 1:, ..., :fold],
         jnp.zeros((n, 1, h, w, fold), x.dtype)], axis=1)
    right = jnp.concatenate(
        [jnp.zeros((n, 1, h, w, fold), x.dtype),
         x[:, :-1, ..., fold:2 * fold]], axis=1)
    rest = x[..., 2 * fold:]
    out = jnp.concatenate([left, right, rest], axis=-1)
    return out.reshape(nt, h, w, c)


class TSMBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    with_downsample: bool = False
    num_segments: int = 8
    shift_div: int = 8
    expansion: int = 1

    @nn.compact
    def __call__(self, x, ura: bool = True):
        identity = x
        out = temporal_shift(x, self.num_segments, self.shift_div)
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                     (1, 1), (1, 1), act=True, name='conv1')(out, ura)
        out = ConvBN(self.planes, (3, 3), (1, 1), (1, 1), (1, 1), act=False,
                     name='conv2')(out, ura)
        if self.with_downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1),
                              (self.stride, self.stride), (0, 0), (1, 1),
                              act=False, name='downsample')(x, ura)
        return nn.relu(out + identity)


class TSMBottleneck(nn.Module):
    planes: int
    stride: int = 1
    with_downsample: bool = False
    num_segments: int = 8
    shift_div: int = 8
    expansion: int = 4

    @nn.compact
    def __call__(self, x, ura: bool = True):
        identity = x
        out = temporal_shift(x, self.num_segments, self.shift_div)
        out = ConvBN(self.planes, (1, 1), (1, 1), (0, 0), (1, 1), act=True,
                     name='conv1')(out, ura)
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                     (1, 1), (1, 1), act=True, name='conv2')(out, ura)
        out = ConvBN(self.planes * self.expansion, (1, 1), (1, 1), (0, 0),
                     (1, 1), act=False, name='conv3')(out, ura)
        if self.with_downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1),
                              (self.stride, self.stride), (0, 0), (1, 1),
                              act=False, name='downsample')(x, ura)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNetTSM(nn.Module):
    """Reference resnet_tsm.py:40-294 (shift_place='blockres')."""
    depth: int
    num_segments: int = 8
    is_shift: bool = True
    shift_div: int = 8
    pretrained: Optional[str] = None
    out_indices: Sequence[int] = (3,)
    norm_eval: bool = False
    strides: Sequence[int] = (1, 2, 2, 2)
    # per-stage per-block non-local flags + cfg (reference NL3DWrapper,
    # resnet_tsm.py:10-37,269-283: blocks flagged in non_local get a
    # NonLocal3d applied over the segment axis after the block)
    non_local: Sequence = (0, 0, 0, 0)
    non_local_cfg: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block2d, stage_blocks = ARCH_SETTINGS[self.depth]
        # is_shift=False -> plain 2D blocks (reference gates
        # make_temporal_shift on it, resnet_tsm.py:289)
        if self.is_shift:
            block_cls = TSMBasicBlock if block2d.expansion == 1 \
                else TSMBottleneck
        else:
            block_cls = block2d
        ura = (not train) or self.norm_eval
        x = ConvBN(64, (7, 7), (2, 2), (3, 3), (1, 1), act=True,
                   name='conv1')(x, ura)
        x = max_pool_3x3_s2(x)
        outs = []
        inplanes = 64
        non_locals = tuple(self.non_local) if self.non_local else \
            (0,) * len(stage_blocks)
        for i, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2**i
            stage_nl = non_locals[i] if i < len(non_locals) else 0
            stage_nl = tuple(stage_nl) if isinstance(
                stage_nl, (tuple, list)) else (stage_nl,) * num_blocks
            for j in range(num_blocks):
                stride = self.strides[i] if j == 0 else 1
                with_ds = j == 0 and (
                    stride != 1 or inplanes != planes * block_cls.expansion)
                kwargs = dict(planes=planes, stride=stride,
                              with_downsample=with_ds,
                              name=f'layer{i + 1}_{j}')
                if self.is_shift:
                    kwargs.update(num_segments=self.num_segments,
                                  shift_div=self.shift_div)
                x = block_cls(**kwargs)(x, ura)
                if stage_nl[j]:
                    from ..common.non_local import NL3DWrapper
                    cfg = dict(self.non_local_cfg or {})
                    norm_cfg = cfg.pop('norm_cfg', None)
                    x = NL3DWrapper(
                        planes * block_cls.expansion, self.num_segments,
                        reduction=cfg.get('reduction', 2),
                        use_scale=cfg.get('use_scale', True),
                        mode=cfg.get('mode', 'embedded_gaussian'),
                        sub_sample=cfg.get('sub_sample', False),
                        with_norm=norm_cfg is not None,
                        zeros_init=cfg.get('zeros_init', True),
                        name=f'layer{i + 1}_{j}_nl')(x, train=not ura)
            inplanes = planes * block_cls.expansion
            if i in self.out_indices:
                outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
