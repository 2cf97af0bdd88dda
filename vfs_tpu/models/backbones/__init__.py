from .alexnet import AlexNetV1, AlexNetV2, AlexNetV3
from .resnet import (ARCH_SETTINGS, BasicBlock, Bottleneck, ConvBN, ResNet,
                     ResNetBlockwise, max_pool_3x3_s2)
from .resnet3d import BasicBlock3d, Bottleneck3d, ResNet3d, ResNet3dSlowOnly
from .resnet3d_variants import (ResNet2Plus1d, ResNet3dCSN,
                                ResNet3dSlowFast)
from .resnet_tin import ResNetTIN, TemporalInterlace, linear_sampler, tin_shift
from .resnet_tsm import ResNetTSM, temporal_shift

__all__ = [
    'ARCH_SETTINGS', 'BasicBlock', 'Bottleneck', 'ConvBN', 'ResNet',
    'ResNetBlockwise', 'max_pool_3x3_s2', 'AlexNetV1', 'AlexNetV2',
    'AlexNetV3', 'BasicBlock3d', 'Bottleneck3d', 'ResNet3d',
    'ResNet3dSlowOnly', 'ResNet2Plus1d', 'ResNet3dCSN', 'ResNet3dSlowFast',
    'ResNetTSM', 'temporal_shift', 'ResNetTIN', 'TemporalInterlace', 'linear_sampler', 'tin_shift'
]
