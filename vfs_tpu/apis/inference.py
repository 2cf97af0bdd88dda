"""Recognizer inference API (reference: mmaction/apis/inference.py:14-124
— init_recognizer / inference_recognizer used by the recognition demo)."""

from __future__ import annotations

from operator import itemgetter
from typing import Optional, Tuple

import numpy as np

from ..datasets.pipelines.compose import Compose
from ..models import build_model
from ..utils import Config


def init_recognizer(config, checkpoint: Optional[str] = None,
                    use_frames: bool = False):
    """Build a recognizer from config (+ optional orbax checkpoint).

    Returns a (model, variables, cfg) triple — JAX models are functional,
    so weights travel beside the module instead of inside it.
    """
    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_model(config.model, train_cfg=None,
                        test_cfg=config.get('test_cfg'))
    import jax
    import jax.numpy as jnp
    sample = jnp.zeros((1, 1, 8, 64, 64, 3), jnp.float32) \
        if config.model.get('type') == 'Recognizer3D' \
        else jnp.zeros((1, 3, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False,
                           return_loss=False)
    if checkpoint is not None:
        from ..checkpoint import restore_checkpoint
        restored = restore_checkpoint(checkpoint, dict(variables))
        variables = restored
    return model, variables, config


def inference_recognizer(model_tuple, video_path: str,
                         label_path: Optional[str] = None,
                         use_frames: bool = False,
                         topk: int = 5) -> Tuple:
    """Run the test pipeline on one video and return top-k
    (label_or_index, score) pairs."""
    model, variables, cfg = model_tuple
    test_pipeline = Compose(cfg.data.test.pipeline)
    start_index = cfg.data.test.get('start_index', 0)
    data = dict(filename=video_path, label=-1, start_index=start_index,
                modality='RGB')
    data = test_pipeline(data)
    import jax.numpy as jnp
    imgs = jnp.asarray(data['imgs'])[None]
    scores = model.apply(variables, imgs, train=False, return_loss=False)
    scores = np.asarray(scores)[0]
    if label_path is not None:
        with open(label_path) as f:
            labels = [line.strip() for line in f]
        if len(labels) < len(scores):
            # zip would silently drop the tail classes and corrupt the
            # ranking; pad with index placeholders instead
            from ..utils import get_root_logger
            get_root_logger().warning(
                f'label file has {len(labels)} entries but the model '
                f'outputs {len(scores)} classes; padding with indices')
            labels += [f'class_{i}' for i in range(len(labels),
                                                   len(scores))]
        score_pairs = list(zip(labels, scores))
    else:
        score_pairs = list(enumerate(scores))
    score_pairs = sorted(score_pairs, key=itemgetter(1), reverse=True)
    return score_pairs[:topk]
