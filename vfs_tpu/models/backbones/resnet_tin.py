"""ResNet-TIN: temporal interlacing network (Flax).

Reference: mmaction/models/backbones/resnet_tin.py. The mmcv CUDA
``tin_shift`` op (group-wise temporal shift by per-sample integer offsets)
becomes a clamped gather along T; ``linear_sampler`` interpolates between
floor/ceil offsets — all jit-friendly XLA ops, no custom kernels needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES
from .resnet import ARCH_SETTINGS, ConvBN, max_pool_3x3_s2


def tin_shift(data: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Group-wise temporal shift (mmcv.ops.tin_shift parity).

    Args:
        data: (N, T, C, M) features; channels split evenly into
            ``offset.shape[1]`` groups.
        offset: (N, groups) int32 — group g reads from ``t - offset``
            (zeros outside [0, T)).
    """
    n, t, c, m = data.shape
    groups = offset.shape[1]
    group_size = c // groups
    # per-channel source index: t_src[n, t, c] = t - offset[n, group(c)]
    toff = jnp.repeat(offset, group_size, axis=1)  # (N, C)
    t_idx = jnp.arange(t)[None, :, None]  # (1, T, 1)
    t_src = t_idx - toff[:, None, :]      # (N, T, C)
    valid = (t_src >= 0) & (t_src < t)
    t_src_c = jnp.clip(t_src, 0, t - 1)
    gathered = jnp.take_along_axis(
        data, t_src_c[..., None].astype(jnp.int32), axis=1)
    return jnp.where(valid[..., None], gathered, 0.0)


def linear_sampler(data: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Differentiable temporal sampling (reference resnet_tin.py:15-62).

    data: (N, T, C, H, W); offset: (N, groups) float.
    """
    n, t, c, h, w = data.shape
    offset0 = jnp.floor(offset).astype(jnp.int32)
    offset1 = offset0 + 1
    flat = data.reshape(n, t, c, h * w)
    data0 = tin_shift(flat, offset0)
    data1 = tin_shift(flat, offset1)
    weight0 = 1 - (offset - offset0.astype(offset.dtype))  # (N, groups)
    weight1 = 1 - weight0
    group_size = c // offset.shape[1]
    w0 = jnp.repeat(weight0, group_size, axis=1)[:, None, :, None]
    w1 = jnp.repeat(weight1, group_size, axis=1)[:, None, :, None]
    out = w0 * data0 + w1 * data1
    return out.reshape(n, t, c, h, w)


class OffsetNet(nn.Module):
    """conv1d + 2 fcs -> offsets in (-2, 2) (reference :150-214)."""
    groups: int
    num_segments: int

    @nn.compact
    def __call__(self, x):
        # x: (N, C, T)
        n, _, t = x.shape
        x = jnp.moveaxis(x, 1, 2)  # (N, T, C)
        x = nn.Conv(1, (3,), padding=[(1, 1)], name='conv')(x)[..., 0]
        x = nn.relu(nn.Dense(self.num_segments, name='fc1')(x))
        x = nn.Dense(self.groups, name='fc2',
                     bias_init=nn.initializers.constant(0.5108))(x)
        x = x.reshape(n, 1, -1)
        return 4 * (jax.nn.sigmoid(x) - 0.5)


class WeightNet(nn.Module):
    """conv1d + sigmoid*2 (reference :96-148)."""
    groups: int

    @nn.compact
    def __call__(self, x):
        # x: (N, C, T)
        n, _, t = x.shape
        x = jnp.moveaxis(x, 1, 2)  # (N, T, C)
        x = nn.Conv(self.groups, (3,), padding=[(1, 1)],
                    bias_init=nn.initializers.zeros, name='conv')(x)
        return 2 * jax.nn.sigmoid(x)  # (N, T, groups)


class TemporalInterlace(nn.Module):
    """Reference :216-304 (deform_groups hard-coded to 2)."""
    in_channels: int
    num_segments: int = 3
    shift_div: int = 1

    @nn.compact
    def __call__(self, x):
        # x: (N*T, H, W, C) channels-last
        nt, h, w, c = x.shape
        t = self.num_segments
        n = nt // t
        num_folds = c // self.shift_div
        deform_groups = 2
        x_desc = x[..., :num_folds].reshape(n, t, h, w, num_folds)
        x_pooled = jnp.mean(x_desc, axis=(2, 3))       # (N, T, folds)
        x_pooled = jnp.moveaxis(x_pooled, 1, 2)        # (N, folds, T)
        x_offset = OffsetNet(deform_groups, t,
                             name='offset_net')(x_pooled).reshape(n, -1)
        x_weight = WeightNet(deform_groups, name='weight_net')(x_pooled)
        x_offset = jnp.concatenate([x_offset, -x_offset], axis=1)  # (N, 4)
        # to (N, T, folds, H, W) layout for the sampler
        x_nchw = jnp.moveaxis(x_desc, -1, 2)  # (N, T, folds, H, W)
        x_shift = linear_sampler(x_nchw, x_offset)
        # weights: (N, T, groups) -> (N, T, folds)
        xw = jnp.repeat(x_weight[:, :, :, None], 2, axis=2).reshape(
            n, t, 2 * deform_groups, 1)
        xw = jnp.tile(xw, (1, 1, 1, num_folds // (2 * deform_groups)))
        xw = xw.reshape(n, t, num_folds)
        x_shift = x_shift * xw[:, :, :, None, None]
        x_shift = jnp.moveaxis(x_shift, 2, -1).reshape(nt, h, w, num_folds)
        return jnp.concatenate([x_shift, x[..., num_folds:]], axis=-1)


class TINBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    with_downsample: bool = False
    num_segments: int = 8
    shift_div: int = 4
    expansion: int = 1

    @nn.compact
    def __call__(self, x, ura: bool = True):
        identity = x
        out = TemporalInterlace(x.shape[-1], self.num_segments,
                                self.shift_div, name='tin')(x)
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                     (1, 1), (1, 1), act=True, name='conv1')(out, ura)
        out = ConvBN(self.planes, (3, 3), (1, 1), (1, 1), (1, 1), act=False,
                     name='conv2')(out, ura)
        if self.with_downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1),
                              (self.stride, self.stride), (0, 0), (1, 1),
                              act=False, name='downsample')(x, ura)
        return nn.relu(out + identity)


class TINBottleneck(nn.Module):
    planes: int
    stride: int = 1
    with_downsample: bool = False
    num_segments: int = 8
    shift_div: int = 4
    expansion: int = 4

    @nn.compact
    def __call__(self, x, ura: bool = True):
        identity = x
        out = TemporalInterlace(x.shape[-1], self.num_segments,
                                self.shift_div, name='tin')(x)
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
class ResNetTIN(nn.Module):
    """Reference resnet_tin.py:306-380: TSM-style ResNet with a temporal
    interlace module before every block's first conv."""
    depth: int
    num_segments: int = 8
    is_tin: bool = True
    shift_div: int = 4
    pretrained: Optional[str] = None
    out_indices: Sequence[int] = (3,)
    norm_eval: bool = False
    strides: Sequence[int] = (1, 2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block2d, stage_blocks = ARCH_SETTINGS[self.depth]
        # is_tin=False -> plain 2D blocks (reference gates the interlace
        # module on it, resnet_tin.py:371)
        if self.is_tin:
            block_cls = TINBasicBlock if block2d.expansion == 1 \
                else TINBottleneck
        else:
            block_cls = block2d
        ura = (not train) or self.norm_eval
        x = ConvBN(64, (7, 7), (2, 2), (3, 3), (1, 1), act=True,
                   name='conv1')(x, ura)
        x = max_pool_3x3_s2(x)
        outs = []
        inplanes = 64
        for i, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2**i
            for j in range(num_blocks):
                stride = self.strides[i] if j == 0 else 1
                with_ds = j == 0 and (
                    stride != 1 or inplanes != planes * block_cls.expansion)
                kwargs = dict(planes=planes, stride=stride,
                              with_downsample=with_ds,
                              name=f'layer{i + 1}_{j}')
                if self.is_tin:
                    kwargs.update(num_segments=self.num_segments,
                                  shift_div=self.shift_div)
                x = block_cls(**kwargs)(x, ura)
            inplanes = planes * block_cls.expansion
            if i in self.out_indices:
                outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
