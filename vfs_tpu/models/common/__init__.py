from .utils import images2video, mean_list, normalize_logit, video2images

__all__ = ['images2video', 'mean_list', 'normalize_logit', 'video2images']
