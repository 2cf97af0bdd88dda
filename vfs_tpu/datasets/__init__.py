"""Datasets and the threaded prefetching loader.

Importing this package registers every dataset class and pipeline
transform, so config-driven ``build_dataset``/``build_dataloader``
calls resolve without further imports. Video-level datasets return
decoded clip dicts; annotation-style datasets (DAVIS/JHMDB/VIP) carry
their own in-repo ``evaluate`` implementations.
"""

from . import pipelines  # noqa: F401  (register)
from .activitynet_dataset import ActivityNetDataset
from .base import BaseDataset
from .builder import DataLoader, build_dataloader, build_dataset
from .dataset_wrappers import RepeatDataset
from .davis_dataset import DavisDataset
from .image_dataset import ImageDataset
from .jhmdb_dataset import JHMDBDataset
from .rawframe_dataset import RawframeDataset
from .registry import DATASETS, PIPELINES
from .ssn_dataset import SSNDataset
from .video_dataset import VideoDataset
from .vip_dataset import VIPDataset

__all__ = [
    'ActivityNetDataset', 'BaseDataset', 'DataLoader', 'build_dataloader', 'build_dataset',
    'RepeatDataset', 'DavisDataset', 'ImageDataset', 'JHMDBDataset',
    'RawframeDataset', 'DATASETS', 'PIPELINES', 'SSNDataset', 'VideoDataset', 'VIPDataset'
]
