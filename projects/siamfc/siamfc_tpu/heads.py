"""SiamFC cross-correlation heads (Flax).

Reference: projects/siamfc-pytorch/siamfc/heads.py:7-58. The depthwise
(grouped) cross correlation — exemplar features as a conv kernel over the
search features — maps to ``lax.conv_general_dilated`` with
``feature_group_count = batch`` (SURVEY §7 step 6).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def fast_xcorr(z: jnp.ndarray, x: jnp.ndarray,
               out_scale: float) -> jnp.ndarray:
    """Grouped cross-correlation.

    Args:
        z: (Nz, hz, wz, C) exemplar features (the kernel).
        x: (Nx, hx, wx, C) search features; Nx must be a multiple of Nz.
    Returns:
        (Nx, hx-hz+1, wx-wz+1, 1) response maps.
    """
    nz, hz, wz, c = z.shape
    nx, hx, wx, _ = x.shape
    # lhs: merge the pair axis into channels: (Nx/Nz, hx, wx, Nz*C)
    lhs = x.reshape(nx // nz, nz, hx, wx, c)
    lhs = jnp.moveaxis(lhs, 1, 3).reshape(nx // nz, hx, wx, nz * c)
    # rhs HWIO with feature_group_count=nz: (hz, wz, C, Nz)
    rhs = jnp.moveaxis(z, 0, -1)  # (hz, wz, C, Nz)
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=nz,
        preferred_element_type=jnp.float32)
    # (Nx/Nz, h', w', Nz) -> (Nx, h', w', 1)
    out = jnp.moveaxis(out, 3, 1).reshape(nx, out.shape[1], out.shape[2], 1)
    return out * out_scale


class SiamFC(nn.Module):
    """Parameter-free xcorr head (reference heads.py:7-23)."""
    out_scale: float = 0.001

    @nn.compact
    def __call__(self, z, x):
        return fast_xcorr(z, x, self.out_scale)


class SiamConvFC(nn.Module):
    """xcorr with 1x1 conv branches on z and x (the linear-probe 'extra
    conv'; reference heads.py:26-58)."""
    in_channels: int
    channels: int
    num_convs: int = 1
    kernel_size: int = 1
    out_scale: float = 0.001

    @nn.compact
    def __call__(self, z, x):
        for i in range(self.num_convs):
            k = (self.kernel_size, self.kernel_size)
            z = nn.Conv(self.channels, k, padding='VALID',
                        name=f'z_conv{i}')(z)
            x = nn.Conv(self.channels, k, padding='VALID',
                        name=f'x_conv{i}')(x)
        return fast_xcorr(z, x, self.out_scale)
