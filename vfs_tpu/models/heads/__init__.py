from .recognition_heads import I3DHead, SlowFastHead, TSMHead, TSNHead
from .sim_siam_head import SimSiamHead

__all__ = ['SimSiamHead', 'I3DHead', 'SlowFastHead', 'TSMHead', 'TSNHead']
