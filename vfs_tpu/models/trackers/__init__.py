from .vanilla_tracker import VanillaTracker

__all__ = ['VanillaTracker']
