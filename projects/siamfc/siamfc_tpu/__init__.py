from .datasets import Pair, SequenceDataset, SiamFCTransforms
from .default_config import default_cfg
from .heads import SiamConvFC, SiamFC, fast_xcorr
from .losses import balanced_loss, create_labels, focal_loss, ohnm_loss
from .otb import ExperimentOTB, center_error, eval_metrics, rect_iou
from .tracker import TrackerSiamFC

__all__ = [
    'Pair', 'SequenceDataset', 'SiamFCTransforms', 'default_cfg',
    'SiamConvFC', 'SiamFC', 'fast_xcorr', 'balanced_loss', 'create_labels',
    'focal_loss', 'ohnm_loss', 'ExperimentOTB', 'center_error',
    'eval_metrics', 'rect_iou', 'TrackerSiamFC'
]
