"""Registries for datasets and pipeline transforms.

Population happens on subpackage import: each dataset/transform module
registers its classes at definition time, so importing
``vfs_tpu.datasets`` is enough to make every config-addressable name
resolvable (same contract as the reference's mmcv registries).
"""

from ..utils import Registry

DATASETS = Registry('dataset')
PIPELINES = Registry('pipeline')
