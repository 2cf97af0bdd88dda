"""Action recognizers.

``Recognizer2D`` runs a 2D backbone over sampled frames and fuses clip
scores with a consensus head (TSN/TSM style); ``Recognizer3D`` feeds
whole clips to a 3D backbone (SlowOnly/SlowFast/CSN/R(2+1)D). Both
share ``BaseRecognizer``'s loss/test plumbing.
"""

from .recognizers import BaseRecognizer, Recognizer2D, Recognizer3D

__all__ = ['BaseRecognizer', 'Recognizer2D', 'Recognizer3D']
