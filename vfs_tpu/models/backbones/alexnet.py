"""AlexNet V1-V3 (SiamFC legacy backbones; reference:
mmaction/models/backbones/alexnet.py:40-100)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..registry import BACKBONES


def _max_pool(x, k, s):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, s, s, 1), 'VALID')


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    with_bn: bool = True

    @nn.compact
    def __call__(self, x, ura: bool = True):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding='VALID',
                    feature_group_count=self.groups, use_bias=True,
                    name='conv')(x)
        if self.with_bn:
            # the reference's custom _BatchNorm2d uses eps=1e-6,
            # momentum=0.05 (siamfc backbones.py:6-10)
            x = nn.BatchNorm(use_running_average=ura, momentum=0.95,
                             epsilon=1e-6, name='bn')(x)
        if self.act:
            x = nn.relu(x)
        return x


@BACKBONES.register_module()
class AlexNetV1(nn.Module):
    """Grouped AlexNet (SiamFC original)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        x = _ConvBNReLU(96, 11, 2, name='conv1')(x, ura)
        x = _max_pool(x, 3, 2)
        x = _ConvBNReLU(256, 5, 1, groups=2, name='conv2')(x, ura)
        x = _max_pool(x, 3, 2)
        x = _ConvBNReLU(384, 3, 1, name='conv3')(x, ura)
        x = _ConvBNReLU(384, 3, 1, groups=2, name='conv4')(x, ura)
        # conv5 is a bare conv in the reference (backbones.py:41)
        x = _ConvBNReLU(256, 3, 1, groups=2, act=False, with_bn=False,
                        name='conv5')(x, ura)
        return x


@BACKBONES.register_module()
class AlexNetV2(nn.Module):

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        x = _ConvBNReLU(96, 11, 2, name='conv1')(x, ura)
        x = _max_pool(x, 3, 2)
        x = _ConvBNReLU(256, 5, 1, groups=2, name='conv2')(x, ura)
        # V2's second pool is stride 1 (output_stride 4, backbones.py:54)
        x = _max_pool(x, 3, 1)
        x = _ConvBNReLU(384, 3, 1, name='conv3')(x, ura)
        x = _ConvBNReLU(384, 3, 1, groups=2, name='conv4')(x, ura)
        x = _ConvBNReLU(32, 3, 1, groups=2, act=False, with_bn=False,
                        name='conv5')(x, ura)
        return x


@BACKBONES.register_module()
class AlexNetV3(nn.Module):

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        x = _ConvBNReLU(192, 11, 2, name='conv1')(x, ura)
        x = _max_pool(x, 3, 2)
        x = _ConvBNReLU(512, 5, 1, name='conv2')(x, ura)
        x = _max_pool(x, 3, 2)
        x = _ConvBNReLU(768, 3, 1, name='conv3')(x, ura)
        x = _ConvBNReLU(768, 3, 1, name='conv4')(x, ura)
        x = _ConvBNReLU(512, 3, 1, act=False, name='conv5')(x, ura)
        return x
