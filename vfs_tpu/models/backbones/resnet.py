"""ResNet backbone (Flax linen, NHWC, TPU-first).

Re-design of the reference ResNet (reference: mmaction/models/backbones/
resnet.py:309-654) with the same capability surface:

- depths 18/34/50/101/152, ``out_indices``, per-stage ``strides`` /
  ``dilations``, ``frozen_stages``, ``norm_eval``, zero-init residual.
- The reference mutates conv strides in-place at test time
  (``switch_strides``, resnet.py:624-637) to get output-stride 8; in JAX a
  stride is a static attribute — you simply construct the module with
  ``strides=(1, 2, 1, 1)`` and load the same weights (weights are
  stride-independent).
- SyncBN (reference configs ``norm_cfg=dict(type='SyncBN')``) maps to
  ``BatchNorm(axis_name='batch')``: the cross-replica mean/var is computed
  over the named mesh axis by XLA collectives on ICI instead of NCCL
  all-reduce per layer.

Parameter tree mirrors torchvision naming (``conv1``, ``bn1``,
``layer{1..4}_{i}`` with ``conv{n}/bn{n}/downsample_conv/downsample_bn``)
so the released VFS checkpoints (torchvision key layout, see reference
tools/convert_weights/convert_to_pretrained.py) convert mechanically —
see ``vfs_tpu.checkpoint``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..registry import BACKBONES

ModuleDef = Any


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 max pool, padding 1 (torch MaxPool2d(3, 2, 1) parity)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


class ConvBN(nn.Module):
    """Conv2D (no bias) + BatchNorm [+ ReLU], the ConvModule analogue.

    BN semantics: torch momentum 0.1 == flax momentum 0.9; eps 1e-5.
    ``sync_axis`` names a mesh axis for cross-replica statistics (SyncBN).
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    act: bool = True
    sync_axis: Optional[str] = None
    dtype: Any = jnp.float32
    zero_init_scale: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding=[self.padding, self.padding] if isinstance(
                self.padding, tuple) else self.padding,
            kernel_dilation=self.dilation, use_bias=False,
            dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9,
            epsilon=1e-5, axis_name=self.sync_axis
            if not use_running_average else None,
            scale_init=nn.initializers.zeros if self.zero_init_scale
            else nn.initializers.ones,
            dtype=self.dtype, name='bn')(x)
        if self.act:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """Reference: resnet.py:15-113 (BasicBlock)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    sync_axis: Optional[str] = None
    dtype: Any = jnp.float32
    zero_init_last: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        identity = x
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                     (self.dilation, self.dilation),
                     (self.dilation, self.dilation), act=True,
                     sync_axis=self.sync_axis, dtype=self.dtype,
                     name='conv1')(x, use_running_average)
        out = ConvBN(self.planes, (3, 3), (1, 1), (1, 1), (1, 1), act=False,
                     sync_axis=self.sync_axis, dtype=self.dtype,
                     zero_init_scale=self.zero_init_last,
                     name='conv2')(out, use_running_average)
        if self.with_downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1),
                              (self.stride, self.stride), (0, 0), (1, 1),
                              act=False, sync_axis=self.sync_axis,
                              dtype=self.dtype,
                              name='downsample')(x, use_running_average)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """Reference: resnet.py:116-232 (Bottleneck, style='pytorch': the
    stride-2 conv is the 3x3 conv2)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    sync_axis: Optional[str] = None
    dtype: Any = jnp.float32
    zero_init_last: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        identity = x
        out = ConvBN(self.planes, (1, 1), (1, 1), (0, 0), (1, 1), act=True,
                     sync_axis=self.sync_axis, dtype=self.dtype,
                     name='conv1')(x, use_running_average)
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                     (self.dilation, self.dilation),
                     (self.dilation, self.dilation), act=True,
                     sync_axis=self.sync_axis, dtype=self.dtype,
                     name='conv2')(out, use_running_average)
        out = ConvBN(self.planes * self.expansion, (1, 1), (1, 1), (0, 0),
                     (1, 1), act=False, sync_axis=self.sync_axis,
                     dtype=self.dtype, zero_init_scale=self.zero_init_last,
                     name='conv3')(out, use_running_average)
        if self.with_downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1),
                              (self.stride, self.stride), (0, 0), (1, 1),
                              act=False, sync_axis=self.sync_axis,
                              dtype=self.dtype,
                              name='downsample')(x, use_running_average)
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module()
class ResNet(nn.Module):
    """ResNet backbone, NHWC in/out.

    Args mirror the reference (resnet.py:346-420). ``pretrained`` is kept in
    the signature for config compatibility but weight loading is explicit via
    ``vfs_tpu.checkpoint`` (functional params, no in-module mutation).

    ``__call__(x, train=False)`` returns a tuple of feature maps at
    ``out_indices`` (or the single map if one index), like the reference
    forward (resnet.py:555-575).
    """
    depth: int
    in_channels: int = 3
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (3,)
    frozen_stages: int = -1
    norm_eval: bool = False
    sync_axis: Optional[str] = None
    pretrained: Optional[str] = None
    torchvision_pretrain: bool = True
    zero_init_residual: bool = True
    partial_bn: bool = False
    with_cp: bool = False
    dtype: Any = jnp.float32

    @property
    def block_counts(self):
        return ARCH_SETTINGS[self.depth][1][:self.num_stages]

    @property
    def feat_dim(self):
        block, counts = ARCH_SETTINGS[self.depth]
        return block.expansion * 64 * 2**(len(counts[:self.num_stages]) - 1)

    @property
    def output_stride(self):
        """Reference: resnet.py:589-591."""
        out = 4
        for s in self.strides[:self.num_stages]:
            out *= s
        return out

    def stage_channels(self, index: int) -> int:
        block, _ = ARCH_SETTINGS[self.depth]
        return 64 * 2**index * block.expansion

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depth not in ARCH_SETTINGS:
            raise KeyError(f'invalid depth {self.depth} for resnet')
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]

        # a stage's BN runs in inference mode when frozen or norm_eval
        # (reference: _freeze_stages resnet.py:593-609, norm_eval :645-654);
        # partial_bn keeps only the stem's BN training (reference
        # _partial_bn :611-623, the TSN finetuning recipe)
        def ura(stage_idx):  # use_running_average for BN in this stage
            if not train or self.norm_eval:
                return True
            if self.partial_bn and stage_idx >= 0:
                return True
            return stage_idx <= self.frozen_stages - 1 if stage_idx >= 0 \
                else self.frozen_stages >= 0

        x = ConvBN(64, (7, 7), (2, 2), (3, 3), (1, 1), act=True,
                   sync_axis=self.sync_axis, dtype=self.dtype,
                   name='conv1')(x, ura(-1))
        x = max_pool_3x3_s2(x)

        outs = []
        inplanes = 64
        for i, num_blocks in enumerate(stage_blocks):
            stride = self.strides[i]
            dilation = self.dilations[i]
            planes = 64 * 2**i
            stage_ura = ura(i)
            for j in range(num_blocks):
                if j == 0:
                    with_ds = (stride != 1
                               or inplanes != planes * block_cls.expansion)
                    # reference make_res_layer:285 — first block uses
                    # dilation//2 when dilation > 1
                    blk_dil = dilation if dilation == 1 else dilation // 2
                    blk_stride = stride
                else:
                    with_ds = False
                    blk_dil = dilation
                    blk_stride = 1
                blk_kwargs = dict(
                    planes=planes, stride=blk_stride, dilation=blk_dil,
                    with_downsample=with_ds, sync_axis=self.sync_axis,
                    dtype=self.dtype,
                    zero_init_last=self.zero_init_residual,
                    name=f'layer{i + 1}_{j}')
                if self.with_cp:
                    x = nn.remat(block_cls, static_argnums=(2,))(
                        **blk_kwargs)(x, stage_ura)
                else:
                    x = block_cls(**blk_kwargs)(x, stage_ura)
            inplanes = planes * block_cls.expansion
            if i in self.out_indices:
                outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)


class ResNetBlockwise(nn.Module):
    """Per-block forward for ``all_blocks`` eval: returns the activation
    after every block of the stages in ``out_indices`` (reference:
    vanilla_tracker.py:32-45 ``extract_feat_test`` all_blocks branch), and
    runs the remaining stages normally.

    Shares the exact parameter tree with ``ResNet`` (same submodule names),
    so one set of converted weights serves both."""
    depth: int
    in_channels: int = 3
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (3,)
    frozen_stages: int = -1
    norm_eval: bool = False
    sync_axis: Optional[str] = None
    pretrained: Optional[str] = None
    torchvision_pretrain: bool = True
    zero_init_residual: bool = True
    partial_bn: bool = False
    with_cp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        x = ConvBN(64, (7, 7), (2, 2), (3, 3), (1, 1), act=True,
                   sync_axis=self.sync_axis, dtype=self.dtype,
                   name='conv1')(x, True)
        x = max_pool_3x3_s2(x)
        outs = []
        inplanes = 64
        for i, num_blocks in enumerate(stage_blocks):
            stride = self.strides[i]
            dilation = self.dilations[i]
            planes = 64 * 2**i
            for j in range(num_blocks):
                if j == 0:
                    with_ds = (stride != 1
                               or inplanes != planes * block_cls.expansion)
                    blk_dil = dilation if dilation == 1 else dilation // 2
                    blk_stride = stride
                else:
                    with_ds = False
                    blk_dil = dilation
                    blk_stride = 1
                x = block_cls(
                    planes=planes, stride=blk_stride, dilation=blk_dil,
                    with_downsample=with_ds, sync_axis=self.sync_axis,
                    dtype=self.dtype,
                    zero_init_last=self.zero_init_residual,
                    name=f'layer{i + 1}_{j}')(x, True)
                if i in self.out_indices:
                    outs.append(x)
            inplanes = planes * block_cls.expansion
        return tuple(outs)
