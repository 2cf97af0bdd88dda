"""Small shared utilities (reference: mmaction/utils/misc.py, collect_env)."""

from __future__ import annotations

import os
import random
import sys
from typing import Dict

import numpy as np


def add_prefix(inputs: Dict, prefix: str) -> Dict:
    """Prefix every key of a dict with ``f'{prefix}.'`` (reference:
    mmaction/utils/misc.py add_prefix)."""
    return {f'{prefix}.{k}': v for k, v in inputs.items()}


def add_suffix(inputs: Dict, suffix: str) -> Dict:
    return {f'{k}.{suffix}': v for k, v in inputs.items()}


def set_random_seed(seed: int):
    """Seed python/numpy RNGs. JAX randomness is key-based and derived from
    this seed explicitly in train/test loops."""
    random.seed(seed)
    np.random.seed(seed)


def terminal_is_available() -> bool:
    """Progress bars are suppressed under Kubernetes (reference:
    mmaction/utils/misc.py:66-70)."""
    if any(k.startswith('KUBERNETES') for k in os.environ):
        return False
    return sys.stdout.isatty()


def collect_env() -> Dict[str, str]:
    import platform

    import jax
    env = {
        'sys.platform': sys.platform,
        'Python': sys.version.replace('\n', ''),
        'platform': platform.platform(),
        'JAX': jax.__version__,
        'jax.devices': str(jax.devices()),
        'default_backend': jax.default_backend(),
    }
    try:
        import flax
        env['Flax'] = flax.__version__
    except Exception:
        pass
    try:
        import optax
        env['Optax'] = optax.__version__
    except Exception:
        pass
    return env
