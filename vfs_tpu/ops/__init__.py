from .affinity import (compute_affinity, grid_mask, l2_normalize, propagate,
                       propagate_temporal, spatial_neighbor)
from .attention import local_square_attention, masked_attention_efficient
from .local_attention_tiled import local_masked_topk_attend
from .propagation import PropagationConfig, propagate_video
from .resize import pil_nearest_resize, resize_bilinear, resize_nearest

__all__ = [
    'compute_affinity', 'grid_mask', 'l2_normalize', 'propagate',
    'propagate_temporal', 'spatial_neighbor', 'local_square_attention',
    'masked_attention_efficient', 'local_masked_topk_attend',
    'PropagationConfig', 'propagate_video', 'pil_nearest_resize',
    'resize_bilinear', 'resize_nearest'
]
