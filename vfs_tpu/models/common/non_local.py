"""Non-local block (flax, channels-last).

TPU-native equivalent of mmcv's ``NonLocal3d`` as consumed by the
reference backbones (reference: mmaction/models/backbones/resnet3d.py:
54-77,123-125,149 wires it per block; resnet_tsm.py:10-37 wraps 2D blocks
via ``NL3DWrapper``). mmcv semantics reproduced:

  - ``g``/``theta``/``phi`` are 1x1x1 convs to ``in_channels//reduction``
    (bias, no norm/act), ``conv_out`` is a 1x1x1 conv back to
    ``in_channels`` with optional norm and NO activation;
  - pairwise modes: ``gaussian`` (plain softmax over raw dot of x),
    ``embedded_gaussian`` (default; softmax of theta.phi, scaled by
    1/sqrt(inter) when ``use_scale``), ``dot_product`` (mean over keys),
    ``concatenation`` (ReLU(conv([theta; phi])) / N);
  - ``sub_sample`` max-pools keys/values spatially by 2 (kernel (1,2,2));
  - residual: ``x + conv_out(y)``, with mmcv's ``zeros_init`` default —
    the block starts as identity (conv_out's norm scale, or its conv
    kernel when unnormed, is zero-initialized).

Layout is NTHWC; the attention flattens (T, H, W) exactly like mmcv's
``view(n, c, -1)`` over (C, T, H, W) — the flatten order (T major, W
minor) matches, so weights bridged from torch produce identical outputs
(tests/test_parity_torch.py::test_non_local3d_*).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class NonLocal3d(nn.Module):
    """mmcv.cnn.NonLocal3d equivalent. Input/output: (N, T, H, W, C)."""
    in_channels: int
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'
    sub_sample: bool = False
    with_norm: bool = True  # conv_out norm (mmaction passes BN3d norm_cfg)
    zeros_init: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.mode not in ('gaussian', 'embedded_gaussian', 'dot_product',
                             'concatenation'):
            raise ValueError(f'unsupported non-local mode {self.mode!r}')
        n, t, h, w, c = x.shape
        inter = max(self.in_channels // self.reduction, 1)

        def conv1(features, name, zeros=False, bias=True):
            return nn.Conv(
                features, (1, 1, 1), use_bias=bias, dtype=self.dtype,
                kernel_init=(nn.initializers.zeros if zeros else
                             nn.initializers.normal(0.01)), name=name)

        def pool_keys(v):
            # mmcv sub_sample: MaxPool3d(kernel_size=(1, 2, 2))
            return nn.max_pool(v.reshape(n * t, h, w, -1), (2, 2), (2, 2)
                               ).reshape(n, t, h // 2, w // 2, -1)

        g_x = conv1(inter, 'g')(x)
        if self.sub_sample:
            g_x = pool_keys(g_x)
        g_x = g_x.reshape(n, -1, inter)                       # (n, S_k, i)

        if self.mode == 'gaussian':
            theta_x = x.reshape(n, -1, c)
            phi_x = pool_keys(x) if self.sub_sample else x
            phi_x = phi_x.reshape(n, -1, c)
            pairwise = jnp.einsum('nqc,nkc->nqk', theta_x, phi_x)
            pairwise = nn.softmax(pairwise, axis=-1)
        elif self.mode == 'concatenation':
            theta_x = conv1(inter, 'theta')(x).reshape(n, -1, inter)
            phi_x = conv1(inter, 'phi')(x)
            if self.sub_sample:
                phi_x = pool_keys(phi_x)
            phi_x = phi_x.reshape(n, -1, inter)
            nq, nk = theta_x.shape[1], phi_x.shape[1]
            cat = jnp.concatenate(
                [jnp.broadcast_to(theta_x[:, :, None], (n, nq, nk, inter)),
                 jnp.broadcast_to(phi_x[:, None], (n, nq, nk, inter))],
                axis=-1)
            pairwise = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               name='concat_project')(cat)
            pairwise = nn.relu(pairwise)[..., 0] / nk
        else:  # embedded_gaussian / dot_product
            theta_x = conv1(inter, 'theta')(x).reshape(n, -1, inter)
            phi_x = conv1(inter, 'phi')(x)
            if self.sub_sample:
                phi_x = pool_keys(phi_x)
            phi_x = phi_x.reshape(n, -1, inter)
            pairwise = jnp.einsum('nqc,nkc->nqk', theta_x, phi_x)
            if self.mode == 'embedded_gaussian':
                if self.use_scale:
                    pairwise = pairwise / jnp.sqrt(
                        jnp.asarray(inter, jnp.float32))
                pairwise = nn.softmax(pairwise, axis=-1)
            else:  # dot_product: mean over keys
                pairwise = pairwise / pairwise.shape[-1]

        y = jnp.einsum('nqk,nki->nqi', pairwise, g_x)
        y = y.reshape(n, t, h, w, inter)
        out = conv1(self.in_channels, 'conv_out',
                    zeros=self.zeros_init and not self.with_norm,
                    bias=not self.with_norm)(y)
        if self.with_norm:
            out = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
                scale_init=(nn.initializers.zeros if self.zeros_init
                            else nn.initializers.ones), name='norm')(out)
        return x + out


class NL3DWrapper(nn.Module):
    """Apply NonLocal3d to a 2D feature batch of ``num_segments`` frames
    (reference resnet_tsm.py:10-37: (N*seg, C, H, W) -> NL3d over seg)."""
    in_channels: int
    num_segments: int
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'
    sub_sample: bool = False
    with_norm: bool = True
    zeros_init: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n, h, w, c = x.shape
        seg = self.num_segments
        v = x.reshape(n // seg, seg, h, w, c)
        v = NonLocal3d(self.in_channels, self.reduction, self.use_scale,
                       self.mode, self.sub_sample, self.with_norm,
                       self.zeros_init, self.dtype,
                       name='non_local_block')(v, train=train)
        return v.reshape(n, h, w, c)
