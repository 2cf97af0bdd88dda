"""Dataset/pipeline registries (reference: mmaction/datasets/registry.py)."""

from ..utils import Registry

DATASETS = Registry('dataset')
PIPELINES = Registry('pipeline')
