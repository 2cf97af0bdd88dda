from .resnet import (ARCH_SETTINGS, BasicBlock, Bottleneck, ConvBN, ResNet,
                     ResNetBlockwise, max_pool_3x3_s2)

__all__ = [
    'ARCH_SETTINGS', 'BasicBlock', 'Bottleneck', 'ConvBN', 'ResNet',
    'ResNetBlockwise', 'max_pool_3x3_s2'
]
