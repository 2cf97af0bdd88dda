from .regression import (BCELossWithLogits, CrossEntropyLoss, L1Loss,
                         MSELoss, NLLLoss, SmoothL1Loss)
from .sim_loss import CosineSimLoss, DotSimLoss

__all__ = [
    'CosineSimLoss', 'DotSimLoss', 'CrossEntropyLoss', 'BCELossWithLogits',
    'NLLLoss', 'MSELoss', 'L1Loss', 'SmoothL1Loss'
]
