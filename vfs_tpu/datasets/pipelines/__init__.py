from .augmentations import (CenterCrop, ColorJitter, DeviceAug,
                            Flip, Fuse,
                            MultiGroupCrop, MultiScaleCrop,
                            Normalize, PhotoMetricDistortion, RandomCrop,
                            RandomErasing, RandomGaussianBlur,
                            RandomGrayScale, RandomResizedCrop, Resize,
                            RGB2LAB, TenCrop, ThreeCrop)
from .compose import Compose
from .formating import (Collect, FormatShape, ImageToTensor,
                        ToDataContainer, ToTensor, Transpose)
from .loading import (Clip2Frame, DecordDecode, DecordInit, DuplicateFrames,
                      Frame2Clip, GenerateLocalizationLabels,
                      LoadLocalizationFeature, LoadProposals, OpenCVDecode,
                      OpenCVInit, RawFrameDecode, SampleFrames,
                      SampleProposalFrames, SequentialSampleFrames)

__all__ = [
    'CenterCrop', 'ColorJitter', 'DeviceAug', 'Flip', 'MultiScaleCrop', 'Normalize', 'PhotoMetricDistortion', 'RandomCrop', 'RandomErasing', 'RGB2LAB', 'TenCrop', 'ThreeCrop', 'RandomGaussianBlur',
    'RandomGrayScale', 'RandomResizedCrop', 'Resize', 'Compose', 'Collect',
    'FormatShape', 'ToTensor', 'Transpose', 'Clip2Frame', 'DecordDecode',
    'DecordInit', 'DuplicateFrames', 'Frame2Clip', 'OpenCVDecode',
    'OpenCVInit', 'RawFrameDecode', 'SampleFrames', 'SequentialSampleFrames',
    'GenerateLocalizationLabels', 'LoadLocalizationFeature', 'LoadProposals',
    'SampleProposalFrames', 'Fuse', 'MultiGroupCrop', 'ImageToTensor',
    'ToDataContainer'
]
