"""SiamFC tracking losses (reference: projects/siamfc-pytorch/siamfc/
losses.py:24-131), functional JAX."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def balanced_loss(logits: jnp.ndarray, target: jnp.ndarray,
                  neg_weight: float = 1.0) -> jnp.ndarray:
    """Pos/neg-balanced BCE-with-logits, weights normalized to sum 1
    (reference :24-41). Targets in {0, 0.5, 1}; 0.5 gets zero weight."""
    pos = target == 1
    neg = target == 0
    pos_num = jnp.maximum(pos.sum(), 1)
    neg_num = jnp.maximum(neg.sum(), 1)
    weight = pos / pos_num + neg / neg_num * neg_weight
    weight = weight / weight.sum()
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    bce = -(target * log_p + (1 - target) * log_np)
    return (bce * weight).sum()


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray,
               gamma: float = 2.0) -> jnp.ndarray:
    """Numerically-stable focal BCE with the reference's mean-weight
    normalization (reference :44-66)."""
    pos_log_sig = jax.nn.log_sigmoid(logits)
    neg_log_sig = jax.nn.log_sigmoid(-logits)
    prob = jax.nn.sigmoid(logits)
    pos_weight = (1 - prob)**gamma
    neg_weight = prob**gamma
    loss = -(target * pos_weight * pos_log_sig +
             (1 - target) * neg_weight * neg_log_sig)
    avg_weight = target * pos_weight + (1 - target) * neg_weight
    loss = loss / avg_weight.mean()
    return loss.mean()


def ohnm_loss(logits: jnp.ndarray, target: jnp.ndarray,
              neg_ratio: float = 3.0, max_pos: int = 256) -> jnp.ndarray:
    """Online hard negative mining BCE (reference :107-131). JAX variant
    with static shapes: weights positives fully, selects the top
    ``neg_ratio * #pos`` negatives by logit via thresholding."""
    pos = target > 0
    neg = target == 0
    pos_num = pos.sum()
    neg_num = (pos_num * neg_ratio).astype(jnp.int32)
    neg_logits = jnp.where(neg, logits, -jnp.inf)
    flat = neg_logits.reshape(-1)
    k = flat.shape[0]
    sorted_desc = jnp.sort(flat)[::-1]
    idx = jnp.clip(neg_num - 1, 0, k - 1)
    thresh = sorted_desc[idx]
    hard_neg = neg & (logits >= thresh)
    sel = pos | hard_neg
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    bce = -(target * log_p + (1 - target) * log_np)
    return (bce * sel).sum() / jnp.maximum(sel.sum(), 1)


def create_labels(response_hw, r_pos: float, r_neg: float,
                  total_stride: int):
    """Logistic labels from block distance (reference
    siamfc_tracker_base.py:469-500): 1 within r_pos/stride, 0.5 within
    r_neg/stride, else 0."""
    import numpy as np
    h, w = response_hw
    x = np.arange(w) - (w - 1) / 2
    y = np.arange(h) - (h - 1) / 2
    xx, yy = np.meshgrid(x, y)
    dist = np.abs(xx) + np.abs(yy)
    rp = r_pos / total_stride
    rn = r_neg / total_stride
    labels = np.where(dist <= rp, 1.0, np.where(dist < rn, 0.5, 0.0))
    return labels.astype(np.float32)


def ghmc_loss(logits: jnp.ndarray, target: jnp.ndarray, bins: int = 30
              ) -> jnp.ndarray:
    """Gradient-harmonizing BCE (reference losses.py:69-105; stateless
    variant — the torch original keeps a momentum accumulator across steps,
    here density is computed per batch, jit-friendly)."""
    prob = jax.nn.sigmoid(logits)
    g = jnp.abs(prob - target)
    tot = logits.size
    edges = jnp.linspace(0.0, 1.0 + 1e-6, bins + 1)
    which = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,)).at[which.reshape(-1)].add(1.0)
    density = counts[which]
    weights = jnp.where(density > 0, tot / jnp.maximum(density, 1.0), 0.0)
    weights = weights / jnp.maximum(weights.mean(), 1e-12)
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    bce = -(target * log_p + (1 - target) * log_np)
    return (bce * weights).sum() / tot
