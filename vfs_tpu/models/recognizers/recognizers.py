"""Action recognizers (Flax).

Reference: mmaction/models/recognizers/{base,recognizer2d,recognizer3d}.py.
``average_clips`` semantics from base.py:58-84 ('score' | 'prob' | None).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import builder
from ..registry import RECOGNIZERS


class BaseRecognizer(nn.Module):
    backbone: Any
    cls_head: Any
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None

    def setup(self):
        self._backbone = builder.build_backbone(dict(self.backbone))
        self._cls_head = builder.build_head(dict(self.cls_head))

    def average_clip(self, cls_score):
        """Reference base.py:58-84."""
        test_cfg = dict(self.test_cfg or {})
        average_clips = test_cfg.get('average_clips', None)
        if average_clips not in ('score', 'prob', None):
            raise ValueError(f'{average_clips} is not supported')
        if average_clips == 'prob':
            return jnp.mean(jax.nn.softmax(cls_score, axis=1), axis=0,
                            keepdims=True)
        if average_clips == 'score':
            return jnp.mean(cls_score, axis=0, keepdims=True)
        return cls_score


@RECOGNIZERS.register_module()
class Recognizer2D(BaseRecognizer):
    """2D recognizer (reference recognizer2d.py): clips become extra batch,
    heads consume per-segment features."""

    def __call__(self, imgs, labels=None, train: bool = True,
                 return_loss: bool = True):
        # imgs: (N, num_segs, H, W, C)
        batches = imgs.shape[0]
        imgs = imgs.reshape((-1,) + imgs.shape[2:])
        num_segs = imgs.shape[0] // batches
        x = self._backbone(imgs, train=train)
        if isinstance(x, tuple):
            x = x[-1]
        cls_score = self._cls_head(x, num_segs, train=train)
        if return_loss:
            assert labels is not None
            return self._cls_head.loss(cls_score, labels.reshape(-1))
        return self.average_clip(cls_score)


@RECOGNIZERS.register_module()
class Recognizer3D(BaseRecognizer):
    """3D recognizer (reference recognizer3d.py): clip dim folds into
    batch; head consumes (N, T, H, W, C) features."""

    def __call__(self, imgs, labels=None, train: bool = True,
                 return_loss: bool = True):
        # imgs: (N, num_clips, T, H, W, C)
        imgs = imgs.reshape((-1,) + imgs.shape[2:])
        x = self._backbone(imgs, train=train)
        cls_score = self._cls_head(x, train=train)
        if return_loss:
            assert labels is not None
            return self._cls_head.loss(cls_score, labels.reshape(-1))
        return self.average_clip(cls_score)
