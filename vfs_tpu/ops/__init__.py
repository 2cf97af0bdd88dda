from .affinity import (compute_affinity, grid_mask, l2_normalize, propagate,
                       propagate_temporal, spatial_neighbor)
from .attention import local_square_attention, masked_attention_efficient
from .resize import pil_nearest_resize, resize_bilinear, resize_nearest

__all__ = [
    'compute_affinity', 'grid_mask', 'l2_normalize', 'propagate',
    'propagate_temporal', 'spatial_neighbor', 'local_square_attention',
    'masked_attention_efficient', 'pil_nearest_resize', 'resize_bilinear',
    'resize_nearest'
]
