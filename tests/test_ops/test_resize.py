"""Resize parity: matmul bilinear vs torch F.interpolate(align_corners=
False) and jax.image.resize."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vfs_tpu.ops import resize_bilinear, resize_nearest


def test_bilinear_upsample_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 60, 107, 5).astype(np.float32)
    out = resize_bilinear(jnp.asarray(x), (480, 854))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(480, 854), mode='bilinear',
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_bilinear_mild_downsample_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    out = resize_bilinear(jnp.asarray(x), (48, 64))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(48, 64), mode='bilinear', align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_bilinear_matches_jax_image_upsample():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 7, 9, 2).astype(np.float32)
    out = resize_bilinear(jnp.asarray(x), (21, 27))
    ref = jax.image.resize(jnp.asarray(x), (1, 21, 27, 2), method='linear')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_nearest_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 6, 8, 2).astype(np.float32)
    out = resize_nearest(jnp.asarray(x), (18, 24))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(18, 24), mode='nearest')
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref)
