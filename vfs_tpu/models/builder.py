"""Model builders (reference: mmaction/models/builder.py:16-78)."""

from ..utils import build_from_cfg
from .registry import (BACKBONES, HEADS, LOCALIZERS, LOSSES, RECOGNIZERS,
                       TRACKERS)


def build_backbone(cfg, default_args=None):
    return build_from_cfg(cfg, BACKBONES, default_args)


def build_head(cfg, default_args=None):
    return build_from_cfg(cfg, HEADS, default_args)


def build_loss(cfg, default_args=None):
    return build_from_cfg(cfg, LOSSES, default_args)


def build_tracker(cfg, train_cfg=None, test_cfg=None):
    return build_from_cfg(cfg, TRACKERS,
                          dict(train_cfg=train_cfg, test_cfg=test_cfg))


def build_recognizer(cfg, train_cfg=None, test_cfg=None):
    return build_from_cfg(cfg, RECOGNIZERS,
                          dict(train_cfg=train_cfg, test_cfg=test_cfg))


def build_localizer(cfg, train_cfg=None, test_cfg=None):
    return build_from_cfg(cfg, LOCALIZERS,
                          dict(train_cfg=train_cfg, test_cfg=test_cfg))


def build_model(cfg, train_cfg=None, test_cfg=None):
    """Dispatch on registry membership (reference builder.py:67-78 uses
    registry names; trackers take priority as in the reference)."""
    obj_type = cfg.get('type')
    if obj_type in TRACKERS:
        return build_tracker(cfg, train_cfg=train_cfg, test_cfg=test_cfg)
    if obj_type in RECOGNIZERS:
        return build_recognizer(cfg, train_cfg=train_cfg, test_cfg=test_cfg)
    if obj_type in LOCALIZERS:
        return build_localizer(cfg, train_cfg=train_cfg, test_cfg=test_cfg)
    raise KeyError(f'{obj_type} not registered as tracker/recognizer/'
                   f'localizer')
