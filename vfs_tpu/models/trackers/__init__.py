from .sim_siam_tracker import SimSiamBaseTracker, parse_losses
from .vanilla_tracker import VanillaTracker

__all__ = ['SimSiamBaseTracker', 'VanillaTracker', 'parse_losses']
