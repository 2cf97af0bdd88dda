"""3D ResNet family (Flax, NTHWC).

Reference: mmaction/models/backbones/resnet3d.py:13-808 (ResNet3d,
BasicBlock3d, Bottleneck3d) and resnet3d_slowonly.py. §2.2 compatibility
components: present, registered, tested — not used by the shipped VFS
configs (SURVEY §2.2).

Layout: videos are ``(N, T, H, W, C)``; 3-D convs via flax ``nn.Conv`` with
3-D kernels (XLA lowers to ConvGeneralDilated on the MXU).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..registry import BACKBONES


def max_pool_3d(x, kernel, strides, padding):
    dims = (1,) + tuple(kernel) + (1,)
    strd = (1,) + tuple(strides) + (1,)
    pads = ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strd, pads)


class ConvBN3d(nn.Module):
    features: int
    kernel: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Optional[Tuple[int, int, int]] = None
    dilation: Tuple[int, int, int] = (1, 1, 1)
    act: bool = True
    with_bn: bool = True
    bias: bool = False
    dtype: Any = jnp.float32
    zero_init_scale: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        pad = self.padding if self.padding is not None else tuple(
            k // 2 for k in self.kernel)
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=[(p, p) for p in pad],
                    kernel_dilation=self.dilation, use_bias=self.bias,
                    dtype=self.dtype, name='conv')(x)
        if self.with_bn:
            x = nn.BatchNorm(use_running_average=use_running_average,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             scale_init=nn.initializers.zeros
                             if self.zero_init_scale
                             else nn.initializers.ones, name='bn')(x)
        if self.act:
            x = nn.relu(x)
        return x


def _apply_non_local(x, features, cfg, train, dtype):
    """Reference resnet3d.py:123-125,149: NonLocal3d after the block's
    relu, configured by ``non_local_cfg``."""
    from ..common.non_local import NonLocal3d
    cfg = dict(cfg or {})
    norm_cfg = cfg.pop('norm_cfg', None)
    cfg.pop('conv_cfg', None)
    return NonLocal3d(
        features,
        reduction=cfg.get('reduction', 2),
        use_scale=cfg.get('use_scale', True),
        mode=cfg.get('mode', 'embedded_gaussian'),
        sub_sample=cfg.get('sub_sample', False),
        with_norm=norm_cfg is not None,
        zeros_init=cfg.get('zeros_init', True),
        dtype=dtype, name='non_local_block')(x, train=train)


class BasicBlock3d(nn.Module):
    """Reference resnet3d.py:13-155."""
    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    dilation: int = 1
    inflate: bool = True
    with_downsample: bool = False
    expansion: int = 1
    non_local: bool = False
    non_local_cfg: Any = None
    dtype: Any = jnp.float32
    zero_init_last: bool = False

    @nn.compact
    def __call__(self, x, ura: bool = True):
        identity = x
        k1 = (3, 3, 3) if self.inflate else (1, 3, 3)
        p1 = (1, self.dilation, self.dilation) if self.inflate \
            else (0, self.dilation, self.dilation)
        out = ConvBN3d(self.planes, k1,
                       (self.temporal_stride, self.spatial_stride,
                        self.spatial_stride), p1,
                       (1, self.dilation, self.dilation),
                       dtype=self.dtype, name='conv1')(x, ura)
        k2 = (3, 3, 3) if self.inflate else (1, 3, 3)
        out = ConvBN3d(self.planes, k2, (1, 1, 1), None, (1, 1, 1),
                       act=False, dtype=self.dtype,
                       zero_init_scale=self.zero_init_last,
                       name='conv2')(out, ura)
        if self.with_downsample:
            identity = ConvBN3d(
                self.planes * self.expansion, (1, 1, 1),
                (self.temporal_stride, self.spatial_stride,
                 self.spatial_stride), (0, 0, 0), act=False,
                dtype=self.dtype, name='downsample')(x, ura)
        out = nn.relu(out + identity)
        if self.non_local:
            out = _apply_non_local(out, self.planes * self.expansion,
                                   self.non_local_cfg, not ura, self.dtype)
        return out


class Bottleneck3d(nn.Module):
    """Reference resnet3d.py:155-321 (style='pytorch')."""
    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    dilation: int = 1
    inflate: bool = True
    inflate_style: str = '3x1x1'
    with_downsample: bool = False
    expansion: int = 4
    non_local: bool = False
    non_local_cfg: Any = None
    dtype: Any = jnp.float32
    zero_init_last: bool = False

    @nn.compact
    def __call__(self, x, ura: bool = True):
        identity = x
        if self.inflate:
            if self.inflate_style == '3x1x1':
                k1, k2 = (3, 1, 1), (1, 3, 3)
            else:
                k1, k2 = (1, 1, 1), (3, 3, 3)
        else:
            k1, k2 = (1, 1, 1), (1, 3, 3)
        out = ConvBN3d(self.planes, k1, (1, 1, 1), None,
                       dtype=self.dtype, name='conv1')(x, ura)
        p2 = (k2[0] // 2, self.dilation, self.dilation)
        out = ConvBN3d(self.planes, k2,
                       (self.temporal_stride, self.spatial_stride,
                        self.spatial_stride), p2,
                       (1, self.dilation, self.dilation),
                       dtype=self.dtype, name='conv2')(out, ura)
        out = ConvBN3d(self.planes * self.expansion, (1, 1, 1), (1, 1, 1),
                       None, act=False, dtype=self.dtype,
                       zero_init_scale=self.zero_init_last,
                       name='conv3')(out, ura)
        if self.with_downsample:
            identity = ConvBN3d(
                self.planes * self.expansion, (1, 1, 1),
                (self.temporal_stride, self.spatial_stride,
                 self.spatial_stride), (0, 0, 0), act=False,
                dtype=self.dtype, name='downsample')(x, ura)
        out = nn.relu(out + identity)
        if self.non_local:
            out = _apply_non_local(out, self.planes * self.expansion,
                                   self.non_local_cfg, not ura, self.dtype)
        return out


ARCH_SETTINGS_3D = {
    18: (BasicBlock3d, (2, 2, 2, 2)),
    34: (BasicBlock3d, (3, 4, 6, 3)),
    50: (Bottleneck3d, (3, 4, 6, 3)),
    101: (Bottleneck3d, (3, 4, 23, 3)),
    152: (Bottleneck3d, (3, 8, 36, 3)),
}


def _ntuple(value, n):
    if isinstance(value, (tuple, list)):
        return tuple(value)
    return (value,) * n


@BACKBONES.register_module()
class ResNet3d(nn.Module):
    """Reference resnet3d.py:321-760."""
    depth: int
    pretrained: Optional[str] = None
    pretrained2d: bool = True
    in_channels: int = 3
    num_stages: int = 4
    base_channels: int = 64
    spatial_strides: Sequence[int] = (1, 2, 2, 2)
    temporal_strides: Sequence[int] = (1, 1, 1, 1)
    dilations: Sequence[int] = (1, 1, 1, 1)
    conv1_kernel: Tuple[int, int, int] = (5, 7, 7)
    conv1_stride_t: int = 2
    pool1_stride_t: int = 2
    with_pool2: bool = True
    frozen_stages: int = -1
    inflate: Union[int, Sequence[int]] = (1, 1, 1, 1)
    inflate_style: str = '3x1x1'
    norm_eval: bool = False
    zero_init_residual: bool = True
    out_indices: Sequence[int] = (3,)
    with_cp: bool = False
    # per-stage non-local flags (int per stage, or per-block tuple per
    # stage) + shared cfg (reference resnet3d.py:408-470, make_res_layer
    # :540-544)
    non_local: Union[int, Sequence] = (0, 0, 0, 0)
    non_local_cfg: Any = None
    dtype: Any = jnp.float32

    @property
    def feat_dim(self):
        block, counts = ARCH_SETTINGS_3D[self.depth]
        return block.expansion * self.base_channels * 2**(
            len(counts[:self.num_stages]) - 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS_3D[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        inflates = _ntuple(self.inflate, self.num_stages)
        non_locals = _ntuple(self.non_local, self.num_stages)

        # frozen stages run their BN in inference mode (2D ResNet
        # semantics; reference resnet3d.py _freeze_stages)
        def ura(stage_idx):
            if (not train) or self.norm_eval:
                return True
            return stage_idx <= self.frozen_stages - 1 if stage_idx >= 0 \
                else self.frozen_stages >= 0

        pad1 = tuple(k // 2 for k in self.conv1_kernel)
        x = ConvBN3d(self.base_channels, tuple(self.conv1_kernel),
                     (self.conv1_stride_t, 2, 2), pad1,
                     dtype=self.dtype, name='conv1')(x, ura(-1))
        x = max_pool_3d(x, (1, 3, 3), (self.pool1_stride_t, 2, 2),
                        (0, 1, 1))
        outs = []
        inplanes = self.base_channels
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            stage_inflate = _ntuple(inflates[i], num_blocks)
            stage_nl = _ntuple(non_locals[i], num_blocks)
            for j in range(num_blocks):
                ss = self.spatial_strides[i] if j == 0 else 1
                ts = self.temporal_strides[i] if j == 0 else 1
                with_ds = j == 0 and (
                    ss != 1 or ts != 1
                    or inplanes != planes * block_cls.expansion)
                kwargs = dict(planes=planes, spatial_stride=ss,
                              temporal_stride=ts,
                              dilation=self.dilations[i],
                              inflate=bool(stage_inflate[j]),
                              with_downsample=with_ds,
                              non_local=bool(stage_nl[j]),
                              non_local_cfg=self.non_local_cfg,
                              dtype=self.dtype,
                              zero_init_last=self.zero_init_residual,
                              name=f'layer{i + 1}_{j}')
                if block_cls is Bottleneck3d:
                    kwargs['inflate_style'] = self.inflate_style
                if self.with_cp:
                    # activation rematerialization (reference with_cp:
                    # torch.utils.checkpoint in every block)
                    x = nn.remat(block_cls, static_argnums=(2,))(
                        **kwargs)(x, ura(i))
                else:
                    x = block_cls(**kwargs)(x, ura(i))
            inplanes = planes * block_cls.expansion
            if i == 0 and self.with_pool2:
                x = max_pool_3d(x, (2, 1, 1), (2, 1, 1), (0, 0, 0))
            if i in self.out_indices:
                outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)


@BACKBONES.register_module()
class ResNet3dSlowOnly(nn.Module):
    """SlowOnly = ResNet3d with (1,7,7) stem, no temporal downsampling,
    late-stage temporal inflation (reference resnet3d_slowonly.py:6-57)."""
    depth: int
    pretrained: Optional[str] = None
    in_channels: int = 3
    lateral: bool = False
    conv1_kernel: Tuple[int, int, int] = (1, 7, 7)
    conv1_stride_t: int = 1
    pool1_stride_t: int = 1
    inflate: Sequence[int] = (0, 0, 1, 1)
    with_pool2: bool = False
    out_indices: Sequence[int] = (3,)
    norm_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResNet3d(
            depth=self.depth, in_channels=self.in_channels,
            conv1_kernel=self.conv1_kernel,
            conv1_stride_t=self.conv1_stride_t,
            pool1_stride_t=self.pool1_stride_t, inflate=self.inflate,
            with_pool2=self.with_pool2, out_indices=self.out_indices,
            norm_eval=self.norm_eval, inflate_style='3x1x1',
            dtype=self.dtype, name='resnet3d')(x, train=train)
