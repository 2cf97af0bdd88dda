"""SlowFast / R(2+1)D / CSN backbones (Flax, NTHWC).

Reference: mmaction/models/backbones/resnet3d_slowfast.py:12-487
(ResNet3dPathway with lateral fusion convs, ResNet3dSlowFast two-pathway
forward), resnet2plus1d.py + common/conv2plus1d.py (factorized
spatial+temporal convs), resnet3d_csn.py:69-148 (ir-CSN/ip-CSN depthwise
temporal bottlenecks). §2.2 compatibility components.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES
from .resnet3d import (ARCH_SETTINGS_3D, Bottleneck3d, ConvBN3d, _ntuple,
                       max_pool_3d)


class _PathwaySpec:
    """One SlowFast pathway spec: stem/stage/lateral helpers that declare
    submodules inside the PARENT module's compact scope with a name prefix
    (reference ResNet3dPathway)."""

    def __init__(self, prefix, depth, base_channels=64, lateral=False,
                 speed_ratio=8, channel_ratio=8, fusion_kernel=5,
                 conv1_kernel=(1, 7, 7), conv1_stride_t=1, pool1_stride_t=1,
                 inflate=(1, 1, 1, 1), inflate_style='3x1x1',
                 spatial_strides=(1, 2, 2, 2),
                 temporal_strides=(1, 1, 1, 1), with_pool2=False,
                 pretrained=None, type=None, dilations=(1, 1, 1, 1),
                 norm_eval=False):
        # `type`/`dilations`/`norm_eval` appear in the reference SlowFast
        # pathway configs (resnet3d_slowfast.py:376-398); type is a
        # registry tag, dilations beyond 1 are not used by any shipped
        # SlowFast config
        assert tuple(dilations) == (1, 1, 1, 1), \
            'SlowFast pathway dilations != 1 not supported'
        self.prefix = prefix
        self.depth = depth
        self.base_channels = base_channels
        self.lateral = lateral
        self.speed_ratio = speed_ratio
        self.channel_ratio = channel_ratio
        self.fusion_kernel = fusion_kernel
        self.conv1_kernel = conv1_kernel
        self.conv1_stride_t = conv1_stride_t
        self.pool1_stride_t = pool1_stride_t
        self.inflate = inflate
        self.inflate_style = inflate_style
        self.spatial_strides = spatial_strides
        self.temporal_strides = temporal_strides

    def stem(self, x, ura):
        pad1 = tuple(k // 2 for k in self.conv1_kernel)
        x = ConvBN3d(self.base_channels, tuple(self.conv1_kernel),
                     (self.conv1_stride_t, 2, 2), pad1,
                     name=f'{self.prefix}_conv1')(x, ura)
        return max_pool_3d(x, (1, 3, 3), (self.pool1_stride_t, 2, 2),
                           (0, 1, 1))

    def lateral_conv(self, x, inplanes, idx, ura):
        # bare conv: the reference lateral connections carry NO norm and
        # NO activation (resnet3d_slowfast.py:44-56, norm_cfg=None,
        # act_cfg=None) — parity-locked in test_slowfast_activation_parity
        return ConvBN3d(
            inplanes * 2 // self.channel_ratio,
            (self.fusion_kernel, 1, 1), (self.speed_ratio, 1, 1),
            ((self.fusion_kernel - 1) // 2, 0, 0), bias=False,
            with_bn=False, act=False,
            name=f'{self.prefix}_lateral{idx}')(x, ura)

    def stage(self, x, i, ura):
        block_cls, stage_blocks = ARCH_SETTINGS_3D[self.depth]
        num_blocks = stage_blocks[i]
        planes = self.base_channels * 2**i
        inflates = _ntuple(self.inflate, 4)
        stage_inflate = _ntuple(inflates[i], num_blocks)
        for j in range(num_blocks):
            ss = self.spatial_strides[i] if j == 0 else 1
            ts = self.temporal_strides[i] if j == 0 else 1
            with_ds = j == 0 and (
                ss != 1 or ts != 1
                or x.shape[-1] != planes * block_cls.expansion)
            kwargs = dict(planes=planes, spatial_stride=ss,
                          temporal_stride=ts, dilation=1,
                          inflate=bool(stage_inflate[j]),
                          with_downsample=with_ds,
                          name=f'{self.prefix}_layer{i + 1}_{j}')
            if block_cls is Bottleneck3d:
                kwargs['inflate_style'] = self.inflate_style
            x = block_cls(**kwargs)(x, ura)
        return x


@BACKBONES.register_module()
class ResNet3dSlowFast(nn.Module):
    """Two-pathway SlowFast (reference resnet3d_slowfast.py:354-487)."""
    pretrained: Optional[str] = None
    resample_rate: int = 8
    speed_ratio: int = 8
    channel_ratio: int = 8
    slow_pathway: Any = None
    fast_pathway: Any = None
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = (not train) or self.norm_eval
        slow_cfg = dict(self.slow_pathway or dict(
            depth=50, lateral=True, conv1_kernel=(1, 7, 7),
            conv1_stride_t=1, pool1_stride_t=1, inflate=(0, 0, 1, 1)))
        fast_cfg = dict(self.fast_pathway or dict(
            depth=50, lateral=False, base_channels=8,
            conv1_kernel=(5, 7, 7), conv1_stride_t=1, pool1_stride_t=1))
        slow_cfg.pop('type', None)
        fast_cfg.pop('type', None)
        if slow_cfg.get('lateral'):
            slow_cfg['speed_ratio'] = self.speed_ratio
            slow_cfg['channel_ratio'] = self.channel_ratio
        slow = _PathwaySpec('slow_path', **slow_cfg)
        fast = _PathwaySpec('fast_path', **fast_cfg)

        # x: (N, T, H, W, C)
        x_slow = x[:, ::self.resample_rate]
        x_fast = x[:, ::max(self.resample_rate // self.speed_ratio, 1)]
        x_slow = slow.stem(x_slow, ura)
        x_fast = fast.stem(x_fast, ura)
        if slow_cfg.get('lateral'):
            lat = slow.lateral_conv(x_fast, slow.base_channels, 0, ura)
            x_slow = jnp.concatenate([x_slow, lat], axis=-1)
        block_cls, stage_blocks = ARCH_SETTINGS_3D[slow.depth]
        num_stages = len(stage_blocks)
        for i in range(num_stages):
            x_slow = slow.stage(x_slow, i, ura)
            x_fast = fast.stage(x_fast, i, ura)
            if i != num_stages - 1 and slow_cfg.get('lateral'):
                inplanes = slow.base_channels * 2**i * block_cls.expansion
                lat = slow.lateral_conv(x_fast, inplanes, i + 1, ura)
                x_slow = jnp.concatenate([x_slow, lat], axis=-1)
        return (x_slow, x_fast)


class Conv2Plus1d(nn.Module):
    """Factorized (2+1)D conv: spatial (1,k,k) + BN + ReLU + temporal
    (k,1,1) with the mid-channel formula (reference
    common/conv2plus1d.py)."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, ura: bool = True):
        kt, kh, kw = self.kernel
        st, sh, sw = self.strides
        in_c = x.shape[-1]
        # the reference hardcodes the temporal factor 3 in the
        # mid-channel formula regardless of the actual kt
        # (conv2plus1d.py:61-65) — e.g. the 1x1x1 downsample gets
        # mid=3*in*out/(in+3*out), not kt=1's smaller value
        mid = (3 * in_c * self.features * kh * kw) // (
            in_c * kh * kw + 3 * self.features)
        mid = max(mid, 1)
        x = nn.Conv(mid, (1, kh, kw), strides=(1, sh, sw),
                    padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
                    use_bias=False, name='conv_s')(x)
        x = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                         epsilon=1e-5, name='bn_s')(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (kt, 1, 1), strides=(st, 1, 1),
                    padding=[(kt // 2, kt // 2), (0, 0), (0, 0)],
                    use_bias=False, name='conv_t')(x)
        return x


class Block2Plus1d(nn.Module):
    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    with_downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, ura: bool = True):
        identity = x
        out = Conv2Plus1d(self.planes, (3, 3, 3),
                          (self.temporal_stride, self.spatial_stride,
                           self.spatial_stride), name='conv1')(x, ura)
        out = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                           epsilon=1e-5, name='bn1')(out)
        out = nn.relu(out)
        out = Conv2Plus1d(self.planes, (3, 3, 3), (1, 1, 1),
                          name='conv2')(out, ura)
        out = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                           epsilon=1e-5, name='bn2')(out)
        if self.with_downsample:
            # the reference builds the downsample with the SAME conv_cfg
            # (resnet3d.py make_res_layer): a factorized 1x1x1
            # Conv2plus1d + outer BN, not a plain conv (parity-locked)
            identity = Conv2Plus1d(self.planes * self.expansion, (1, 1, 1),
                                   (self.temporal_stride,
                                    self.spatial_stride,
                                    self.spatial_stride),
                                   name='downsample')(x, ura)
            identity = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                                    epsilon=1e-5,
                                    name='downsample_bn')(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNet2Plus1d(nn.Module):
    """R(2+1)D (reference resnet2plus1d.py:6-49: ResNet3d with
    Conv2plus1d everywhere, no pool2)."""
    depth: int
    pretrained: Optional[str] = None
    base_channels: int = 64
    spatial_strides: Sequence[int] = (1, 2, 2, 2)
    temporal_strides: Sequence[int] = (1, 2, 2, 2)
    conv1_kernel: Tuple[int, int, int] = (3, 7, 7)
    conv1_stride_t: int = 1
    pool1_stride_t: int = 1
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = (not train) or self.norm_eval
        _, stage_blocks = ARCH_SETTINGS_3D[self.depth]
        x = Conv2Plus1d(self.base_channels, tuple(self.conv1_kernel),
                        (self.conv1_stride_t, 2, 2), name='conv1')(x, ura)
        x = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                         epsilon=1e-5, name='bn1')(x)
        x = nn.relu(x)
        x = max_pool_3d(x, (1, 3, 3), (self.pool1_stride_t, 2, 2),
                        (0, 1, 1))
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            for j in range(num_blocks):
                ss = self.spatial_strides[i] if j == 0 else 1
                ts = self.temporal_strides[i] if j == 0 else 1
                with_ds = j == 0 and (ss != 1 or ts != 1
                                      or x.shape[-1] != planes)
                x = Block2Plus1d(planes=planes, spatial_stride=ss,
                                 temporal_stride=ts, with_downsample=with_ds,
                                 name=f'layer{i + 1}_{j}')(x, ura)
        return x


class CSNBottleneck(nn.Module):
    """Channel-separated bottleneck: conv2 is a depthwise 3x3x3
    (ir mode) optionally preceded by a 1x1x1 (ip mode)
    (reference resnet3d_csn.py:14-66)."""
    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    bottleneck_mode: str = 'ir'
    with_downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, ura: bool = True):
        identity = x
        out = ConvBN3d(self.planes, (1, 1, 1), (1, 1, 1), None,
                       name='conv1')(x, ura)
        if self.bottleneck_mode == 'ip':
            out = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                          name='conv2_ip')(out)
        out = nn.Conv(self.planes, (3, 3, 3),
                      strides=(self.temporal_stride, self.spatial_stride,
                               self.spatial_stride),
                      padding=[(1, 1)] * 3, feature_group_count=self.planes,
                      use_bias=False, name='conv2_dw')(out)
        out = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                           epsilon=1e-5, name='bn2')(out)
        out = nn.relu(out)
        out = ConvBN3d(self.planes * self.expansion, (1, 1, 1), (1, 1, 1),
                       None, act=False, name='conv3')(out, ura)
        if self.with_downsample:
            identity = ConvBN3d(self.planes * self.expansion, (1, 1, 1),
                                (self.temporal_stride, self.spatial_stride,
                                 self.spatial_stride), (0, 0, 0), act=False,
                                name='downsample')(x, ura)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNet3dCSN(nn.Module):
    """ir-CSN / ip-CSN (reference resnet3d_csn.py:69-148)."""
    depth: int
    pretrained: Optional[str] = None
    base_channels: int = 64
    bottleneck_mode: str = 'ir'
    spatial_strides: Sequence[int] = (1, 2, 2, 2)
    temporal_strides: Sequence[int] = (1, 2, 2, 2)
    conv1_kernel: Tuple[int, int, int] = (3, 7, 7)
    conv1_stride_t: int = 1
    pool1_stride_t: int = 1
    with_pool2: bool = True  # reference ResNet3d default (parity-locked)
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = (not train) or self.norm_eval
        _, stage_blocks = ARCH_SETTINGS_3D[self.depth]
        pad1 = tuple(k // 2 for k in self.conv1_kernel)
        x = ConvBN3d(self.base_channels, tuple(self.conv1_kernel),
                     (self.conv1_stride_t, 2, 2), pad1, name='conv1')(x, ura)
        x = max_pool_3d(x, (1, 3, 3), (self.pool1_stride_t, 2, 2),
                        (0, 1, 1))
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            for j in range(num_blocks):
                ss = self.spatial_strides[i] if j == 0 else 1
                ts = self.temporal_strides[i] if j == 0 else 1
                with_ds = j == 0 and (ss != 1 or ts != 1
                                      or x.shape[-1] != planes * 4)
                x = CSNBottleneck(planes=planes, spatial_stride=ss,
                                  temporal_stride=ts,
                                  bottleneck_mode=self.bottleneck_mode,
                                  with_downsample=with_ds,
                                  name=f'layer{i + 1}_{j}')(x, ura)
            if i == 0 and self.with_pool2:
                x = max_pool_3d(x, (2, 1, 1), (2, 1, 1), (0, 0, 0))
        return x
