"""Tiled locality attention must be bit-equivalent to the dense masked
path (same circle-mask semantics, spatial_neighbor parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vfs_tpu.ops import spatial_neighbor
from vfs_tpu.ops.affinity import l2_normalize
from vfs_tpu.ops.local_attention_tiled import local_masked_topk_attend
from vfs_tpu.ops.propagation import (PropagationConfig, attend_one_frame,
                                     propagate_video)


@pytest.mark.parametrize('h,w,nr,tile', [
    (12, 17, 6, (4, 8)),    # non-divisible width
    (10, 16, 8, (5, 4)),
    (9, 9, 4, (16, 16)),    # tile larger than image
])
def test_tiled_equals_dense(h, w, nr, tile):
    rng = np.random.RandomState(0)
    f, c, k = 5, 16, 3
    query = l2_normalize(jnp.asarray(rng.randn(h, w, c), jnp.float32), -1)
    bank_f = l2_normalize(jnp.asarray(rng.randn(f, h, w, c), jnp.float32),
                          -1)
    bank_v = jnp.asarray(rng.rand(f, h, w, k), jnp.float32)
    valid = jnp.asarray([True, True, True, False, False])
    masked = jnp.ones((f,), bool)
    mask = spatial_neighbor(h, w, nr, mode='circle')
    cfg = PropagationConfig(topk=4, temperature=0.07, with_norm=True,
                            query_chunk=32)
    dense = attend_one_frame(query, bank_f, bank_v, valid, masked, mask,
                             cfg)
    tiled = local_masked_topk_attend(query, bank_f, bank_v, valid,
                                     radius=nr // 2, temperature=0.07,
                                     topk=4, tile=tile)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_propagate_video_local_equals_dense():
    rng = np.random.RandomState(1)
    t, h, w, c, k = 8, 12, 14, 16, 3
    feats = jnp.asarray(rng.randn(t, h, w, c), jnp.float32)
    seg = jnp.asarray(np.eye(k, dtype=np.float32)[
        rng.randint(0, k, (h, w))])
    nr = 6
    mask = spatial_neighbor(h, w, nr, mode='circle')
    dense_cfg = PropagationConfig(precede_frames=4, topk=5,
                                  temperature=0.07, query_chunk=32)
    local_cfg = dense_cfg._replace(neighbor_range=nr, tile=(4, 8))
    dense = propagate_video(feats, seg, mask, dense_cfg)
    local = propagate_video(feats, seg, None, local_cfg)
    np.testing.assert_allclose(np.asarray(local), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)
