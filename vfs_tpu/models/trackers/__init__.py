"""Trackers.

``SimSiamBaseTracker`` wraps a backbone + SimSiam head(s) for
frame-level similarity pretraining (intra-video positive rolls);
``parse_losses`` reduces its loss dict the reference way. The
``VanillaTracker`` is the evaluation engine: it extracts per-frame
features once, then label-propagates through the whole video inside a
single jitted ``lax.scan`` (DAVIS masks, JHMDB pose heatmaps, VIP
parsing maps).
"""

from .sim_siam_tracker import SimSiamBaseTracker, parse_losses
from .vanilla_tracker import VanillaTracker

__all__ = ['SimSiamBaseTracker', 'VanillaTracker', 'parse_losses']
