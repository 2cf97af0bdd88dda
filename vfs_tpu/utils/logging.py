"""Process-aware logging: text logger + JSONL metric log.

Replaces mmcv's rank-aware ``get_root_logger`` (reference:
mmaction/utils/logger.py:6-24) and the TextLoggerHook/json log pair. In JAX
the analogue of rank is ``jax.process_index()``; only process 0 logs at INFO
by default.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

_initialized_loggers = set()


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def get_root_logger(log_file: Optional[str] = None,
                    log_level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger('vfs_tpu')
    if 'vfs_tpu' in _initialized_loggers:
        if log_file is not None and not any(
                isinstance(h, logging.FileHandler) and
                getattr(h, 'baseFilename', None) == os.path.abspath(log_file)
                for h in logger.handlers):
            fh = logging.FileHandler(log_file)
            fh.setFormatter(_formatter())
            logger.addHandler(fh)
        return logger

    stream = logging.StreamHandler(sys.stdout)
    stream.setFormatter(_formatter())
    logger.addHandler(stream)
    if log_file is not None and _process_index() == 0:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(_formatter())
        logger.addHandler(fh)
    # non-zero processes only log errors (reference logger.py:21-23)
    logger.setLevel(log_level if _process_index() == 0 else logging.ERROR)
    logger.propagate = False
    _initialized_loggers.add('vfs_tpu')
    return logger


def _formatter() -> logging.Formatter:
    return logging.Formatter('%(asctime)s - %(name)s - %(levelname)s - '
                             '%(message)s')


class JsonlLogger:
    """Append-only JSONL metric logger (the reference TextLoggerHook writes a
    twin .log.json; training curves are parsed from it by
    tools/analysis/analyze_logs.py)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, record: Dict[str, Any]):
        record = dict(record)
        record.setdefault('time', time.time())
        with open(self.path, 'a') as f:
            f.write(json.dumps(record, default=_json_default) + '\n')


def _json_default(obj):
    try:
        import numpy as np
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
    except Exception:
        pass
    return str(obj)
