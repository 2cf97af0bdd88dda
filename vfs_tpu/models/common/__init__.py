from .utils import (clamp, images2video, mean_list, normalize_logit, unmap,
                    video2images)

__all__ = ['clamp', 'images2video', 'mean_list', 'normalize_logit', 'unmap',
           'video2images']
