"""Optional Weights & Biases mirroring of the JSONL train log.

Reference parity: ``WandbLoggerHook`` entries in ``log_config.hooks``
(reference tools/train.py:89-98 manipulates them via --disable-wandb /
--suffix; mmcv provides the hook itself). wandb is not a hard
dependency — when the package is missing the logger degrades to a
warned no-op so configs written for wandb machines still run.
"""

from __future__ import annotations

from typing import Optional

from .logging import get_root_logger

__all__ = ['WandbLogger', 'build_wandb_logger']


class WandbLogger:
    """Thin ``wandb.log`` wrapper with lazy init and graceful fallback."""

    def __init__(self, init_kwargs: Optional[dict] = None, **_ignored):
        self._run = None
        self._wandb = None
        try:
            import wandb
            self._wandb = wandb
        except ImportError:
            get_root_logger().warning(
                'WandbLoggerHook configured but the wandb package is not '
                'installed; metrics go to the JSONL log only')
            return
        self._run = self._wandb.init(**(init_kwargs or {}))

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, metrics: dict, step: Optional[int] = None):
        if self._run is not None:
            payload = {k: v for k, v in metrics.items()
                       if isinstance(v, (int, float))}
            self._wandb.log(payload, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()
            self._run = None


def build_wandb_logger(log_config) -> Optional[WandbLogger]:
    """Return a WandbLogger if ``log_config.hooks`` lists a
    WandbLoggerHook entry (reference config idiom), else None."""
    if not log_config:
        return None
    for hook in log_config.get('hooks', []) or []:
        if isinstance(hook, dict) and hook.get('type') == 'WandbLoggerHook':
            kwargs = {k: v for k, v in hook.items() if k != 'type'}
            return WandbLogger(**kwargs)
    return None
