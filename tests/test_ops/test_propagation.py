"""propagate_video (lax.scan ring-buffer engine) must match the reference
frame-loop semantics: per frame t, keys = first frame + previous
``precede_frames`` frames (first frame duplicated while t <= P, reference
vanilla_tracker.py:132-160), masked top-k softmax attention."""

import jax.numpy as jnp
import numpy as np

from vfs_tpu.ops import masked_attention_efficient, spatial_neighbor
from vfs_tpu.ops.propagation import PropagationConfig, propagate_video


def reference_loop(feats, seg_first, mask, cfg):
    """Reference semantics implemented with the (already parity-tested)
    masked_attention_efficient + python frame loop."""
    t_total = feats.shape[0]
    seg_bank = [seg_first]
    outs = [seg_first]
    for t in range(1, t_total):
        key_start = max(0, t - cfg.precede_frames)
        key_feat = feats[key_start:t]
        values = jnp.stack(seg_bank[key_start:t], axis=0)
        if cfg.with_first:
            key_feat = jnp.concatenate([feats[0:1], key_feat], axis=0)
            values = jnp.concatenate([seg_first[None], values], axis=0)
        non_mask_len = 0 if cfg.with_first_neighbor else 1
        out = masked_attention_efficient(
            feats[t][None], key_feat[None], values[None], mask,
            temperature=cfg.temperature, topk=cfg.topk,
            normalize=cfg.with_norm, non_mask_len=non_mask_len)
        seg_bank.append(out[0])
        outs.append(out[0])
    return jnp.stack(outs, axis=0)


def test_propagate_video_matches_reference_loop():
    rng = np.random.RandomState(0)
    t_total, h, w, c, k = 9, 6, 7, 12, 3
    feats = jnp.asarray(rng.randn(t_total, h, w, c), jnp.float32)
    seg_first = jnp.asarray(
        np.eye(k, dtype=np.float32)[rng.randint(0, k, (h, w))])
    mask = spatial_neighbor(h, w, 6, mode='circle')
    cfg = PropagationConfig(precede_frames=4, topk=5, temperature=0.07,
                            query_chunk=16)
    ref = reference_loop(feats, seg_first, mask, cfg)
    out = propagate_video(feats, seg_first, mask, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_propagate_video_no_first_no_mask():
    rng = np.random.RandomState(1)
    t_total, h, w, c, k = 6, 5, 5, 8, 2
    feats = jnp.asarray(rng.randn(t_total, h, w, c), jnp.float32)
    seg_first = jnp.asarray(
        np.eye(k, dtype=np.float32)[rng.randint(0, k, (h, w))])
    cfg = PropagationConfig(precede_frames=3, topk=4, temperature=0.1,
                            with_first=False, query_chunk=8)
    ref = reference_loop(feats, seg_first, None, cfg)
    out = propagate_video(feats, seg_first, None, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_propagate_video_first_neighbor_exempt():
    """with_first_neighbor=False -> the prepended first frame sees no
    spatial mask (reference non_mask_len=1)."""
    rng = np.random.RandomState(2)
    t_total, h, w, c, k = 5, 4, 6, 8, 2
    feats = jnp.asarray(rng.randn(t_total, h, w, c), jnp.float32)
    seg_first = jnp.asarray(
        np.eye(k, dtype=np.float32)[rng.randint(0, k, (h, w))])
    mask = spatial_neighbor(h, w, 4, mode='circle')
    cfg = PropagationConfig(precede_frames=3, topk=4, temperature=0.07,
                            with_first_neighbor=False, query_chunk=8)
    ref = reference_loop(feats, seg_first, mask, cfg)
    out = propagate_video(feats, seg_first, mask, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
