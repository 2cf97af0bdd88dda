"""Parity tests for the propagation math against an independent torch
implementation of the reference semantics (masked_attention_efficient,
reference local_attention.py:237-348; spatial_neighbor,
affinity_utils.py:119-156)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vfs_tpu.ops import (compute_affinity, masked_attention_efficient,
                         propagate, spatial_neighbor)


def torch_masked_attention_efficient(query, key, value, mask,
                                     temperature=1.0, topk=None,
                                     normalize=True, step=32,
                                     non_mask_len=0, mode='softmax'):
    """Reference semantics in torch (NCHW/NCTHW), written from the published
    algorithm: normalize -> K.Q/tau -> mask fill -inf -> topk over keys ->
    softmax -> gather values -> weighted sum."""
    if key.ndim == 4:
        key = key.unsqueeze(2)
        value = value.unsqueeze(2)
    n, c, t, h, w = key.shape
    cv = value.shape[1]
    _, _, hq, wq = query.shape
    if normalize:
        query = F.normalize(query, p=2, dim=1)
        key = F.normalize(key, p=2, dim=1)
    q = query.reshape(n, c, hq * wq)
    k = key.reshape(n, c, t * h * w)
    v = value.reshape(n, cv, t * h * w)
    out = torch.zeros(n, cv, hq * wq)
    for ptr in range(0, hq * wq, step):
        aff = torch.einsum('bci,bcj->bij', k,
                           q[..., ptr:ptr + step]) / temperature
        if mask is not None:
            cur = mask.reshape(1, 1, h * w, hq * wq)[..., ptr:ptr + step]
            cur = cur.expand(n, t - non_mask_len, -1, -1).reshape(
                n, -1, aff.shape[2])
            if non_mask_len > 0:
                ones = torch.ones(n, non_mask_len * h * w, aff.shape[2],
                                  dtype=torch.bool)
                cur = torch.cat([ones, cur], dim=1)
            aff.masked_fill_(~cur.bool(), float('-inf'))
        if topk is not None:
            ta, ti = aff.topk(k=topk, dim=1)
            tv = v.transpose(0, 1).reshape(cv, -1).index_select(
                dim=1, index=ti.reshape(-1)).reshape(
                    cv, *ti.shape).transpose(0, 1)
            if mode == 'softmax':
                ta = ta.softmax(dim=1)
            else:
                ta = ta.clamp(min=0)**2
            cur_out = torch.einsum('bcks,bks->bcs', tv, ta)
        else:
            if mode == 'softmax':
                aff = aff.softmax(dim=1)
            else:
                aff = aff.clamp(min=0)**2
            cur_out = torch.einsum('bck,bks->bcs', v, aff)
        out[..., ptr:ptr + step] = cur_out
    return out.reshape(n, cv, hq, wq)


def torch_spatial_neighbor_circle(height, width, neighbor_range):
    radius = neighbor_range // 2
    gx, gy = torch.meshgrid(torch.arange(height).float(),
                            torch.arange(width).float(), indexing='ij')
    dist = ((gx.reshape(height, width, 1, 1) -
             gx.reshape(1, 1, height, width))**2 +
            (gy.reshape(height, width, 1, 1) -
             gy.reshape(1, 1, height, width))**2)**0.5
    return (dist < radius).reshape(height * width, height * width)


@pytest.mark.parametrize('topk,mask_on,non_mask_len,step', [
    (None, False, 0, None),
    (5, False, 0, None),
    (5, True, 0, 16),
    (5, True, 1, 16),
    (10, True, 0, 7),  # step not dividing num queries
])
def test_masked_attention_parity(topk, mask_on, non_mask_len, step):
    rng = np.random.RandomState(0)
    n, c, t, h, w = 1, 16, 3, 8, 9
    cv = 4
    q_np = rng.randn(n, c, h, w).astype(np.float32)
    k_np = rng.randn(n, c, t, h, w).astype(np.float32)
    v_np = rng.randn(n, cv, t, h, w).astype(np.float32)
    mask_np = None
    mask_jax = None
    if mask_on:
        mask_t = torch_spatial_neighbor_circle(h, w, 6)
        mask_np = mask_t.numpy()
        mask_jax = jnp.asarray(mask_np)

    ref = torch_masked_attention_efficient(
        torch.from_numpy(q_np), torch.from_numpy(k_np),
        torch.from_numpy(v_np),
        torch.from_numpy(mask_np) if mask_np is not None else None,
        temperature=0.07, topk=topk, non_mask_len=non_mask_len,
        step=step or h * w).numpy()

    out = masked_attention_efficient(
        jnp.asarray(np.transpose(q_np, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(k_np, (0, 2, 3, 4, 1))),
        jnp.asarray(np.transpose(v_np, (0, 2, 3, 4, 1))),
        mask_jax, temperature=0.07, topk=topk, step=step,
        non_mask_len=non_mask_len)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_masked_attention_cosine_mode():
    rng = np.random.RandomState(1)
    n, c, t, h, w, cv = 1, 8, 2, 5, 6, 3
    q_np = rng.randn(n, c, h, w).astype(np.float32)
    k_np = rng.randn(n, c, t, h, w).astype(np.float32)
    v_np = rng.randn(n, cv, t, h, w).astype(np.float32)
    ref = torch_masked_attention_efficient(
        torch.from_numpy(q_np), torch.from_numpy(k_np),
        torch.from_numpy(v_np), None, topk=4, mode='cosine').numpy()
    out = masked_attention_efficient(
        jnp.asarray(np.transpose(q_np, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(k_np, (0, 2, 3, 4, 1))),
        jnp.asarray(np.transpose(v_np, (0, 2, 3, 4, 1))),
        None, topk=4, mode='cosine')
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_spatial_neighbor_circle_parity():
    h, w = 7, 11
    ref = torch_spatial_neighbor_circle(h, w, 8).numpy()
    out = np.asarray(spatial_neighbor(h, w, 8, mode='circle'))
    np.testing.assert_array_equal(out, ref)


def test_spatial_neighbor_square():
    h, w = 5, 5
    out = np.asarray(spatial_neighbor(h, w, 2, mode='square'))
    # center query (2,2): keys within rows/cols [1,3] inclusive
    center = out[:, 2 * 5 + 2].reshape(5, 5)
    expected = np.zeros((5, 5), bool)
    expected[1:4, 1:4] = True
    np.testing.assert_array_equal(center, expected)


def test_compute_affinity_softmax_shapes():
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randn(2, 4, 5, 8).astype(np.float32))
    dst = jnp.asarray(rng.randn(2, 4, 5, 8).astype(np.float32))
    aff = compute_affinity(src, dst, temperature=0.5, softmax_axis=1)
    assert aff.shape == (2, 20, 20)
    np.testing.assert_allclose(np.asarray(aff).sum(1),
                               np.ones((2, 20)), rtol=1e-5)


def test_propagate_topk_parity():
    """propagate() vs torch reference (affinity_utils.py:33-50 semantics)."""
    rng = np.random.RandomState(3)
    n, c, h, w = 1, 3, 4, 4
    img = rng.randn(n, c, h, w).astype(np.float32)
    aff = rng.rand(n, h * w, h * w).astype(np.float32)

    a = torch.from_numpy(aff.copy())
    tk = 3
    tk_val_min = a.topk(dim=1, k=tk)[0][:, tk - 1].reshape(n, 1, h * w)
    a = (a - tk_val_min).clamp(min=0)
    a = a / a.sum(dim=1, keepdim=True).clamp(min=1e-12)
    ref = torch.bmm(torch.from_numpy(img).reshape(n, c, -1), a)
    ref = ref.reshape(n, c, h, w).numpy()

    out = propagate(jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                    jnp.asarray(aff), topk=tk)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
