from .sim_siam_head import SimSiamHead

__all__ = ['SimSiamHead']
