from .proposal_utils import (post_processing, soft_nms, temporal_iop,
                             temporal_iou)

__all__ = ['post_processing', 'soft_nms', 'temporal_iop', 'temporal_iou']
