from .bmn_loss import (BinaryLogisticRegressionLoss, BMNLoss,
                       binary_logistic_regression_loss)
from .regression import (BCELossWithLogits, CrossEntropyLoss, L1Loss,
                         MSELoss, NLLLoss, SmoothL1Loss)
from .ssn_loss import OHEMHingeLoss, SSNLoss, ohem_hinge_loss
from .sim_loss import CosineSimLoss, DotSimLoss

__all__ = [
    'CosineSimLoss', 'DotSimLoss', 'BMNLoss', 'BinaryLogisticRegressionLoss', 'binary_logistic_regression_loss', 'CrossEntropyLoss', 'BCELossWithLogits',
    'NLLLoss', 'MSELoss', 'L1Loss', 'SmoothL1Loss', 'OHEMHingeLoss', 'SSNLoss', 'ohem_hinge_loss'
]
