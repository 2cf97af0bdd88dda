from .recognition_heads import I3DHead, SlowFastHead, TSMHead, TSNHead
from .sim_siam_head import DenseSimSiamHead, SimSiamHead
from .ssn_head import SSNHead, STPPTest, STPPTrain

__all__ = ['SimSiamHead', 'DenseSimSiamHead', 'SSNHead', 'STPPTest', 'STPPTrain', 'I3DHead', 'SlowFastHead', 'TSMHead', 'TSNHead']
