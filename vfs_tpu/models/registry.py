"""Model registries (reference: mmaction/models/registry.py:1-9)."""

from ..utils import Registry

BACKBONES = Registry('backbone')
HEADS = Registry('head')
LOSSES = Registry('loss')
TRACKERS = Registry('tracker')
RECOGNIZERS = Registry('recognizer')
LOCALIZERS = Registry('localizer')
