"""Optimizer extras: TSM param groups, CopyOfSGD, lr schedules with
warmup (the TINLrUpdaterHook equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vfs_tpu.core.optimizer import (CopyOfSGD, build_lr_schedule,
                                    build_optimizer, build_tsm_optimizer,
                                    tsm_param_labels)
from vfs_tpu.models import build_model


def test_tsm_param_labels_and_step():
    model = build_model(
        dict(type='Recognizer2D',
             backbone=dict(type='ResNetTSM', depth=18, num_segments=2),
             cls_head=dict(type='TSMHead', num_classes=3, in_channels=512,
                           num_segments=2)),
        test_cfg=dict(average_clips=None))
    imgs = jnp.zeros((1, 2, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), imgs, jnp.asarray([0]),
                   train=False, return_loss=False)
    labels = tsm_param_labels(v['params'])
    flat = jax.tree.leaves(labels)
    assert 'first_conv_weight' in flat
    assert 'bn' in flat
    assert 'lr5_weight' in flat and 'lr10_bias' in flat
    tx = build_tsm_optimizer(v['params'], lr=0.01)
    state = tx.init(v['params'])
    grads = jax.tree.map(jnp.ones_like, v['params'])
    updates, _ = tx.update(grads, state, v['params'])
    # bn group gets no weight decay: update magnitude == lr exactly
    bn_upd = updates['_backbone']['conv1']['bn']['scale']
    np.testing.assert_allclose(np.asarray(bn_upd), -0.01, rtol=1e-5)


def test_copy_of_sgd_matches_builder_sgd():
    params = {'w': jnp.ones((3,))}
    grads = {'w': jnp.full((3,), 0.5)}
    tx1 = CopyOfSGD(0.1, momentum=0.9, weight_decay=1e-4)
    tx2, _ = build_optimizer(
        dict(type='SGD', lr=0.1, momentum=0.9, weight_decay=1e-4))
    u1, _ = tx1.update(grads, tx1.init(params), params)
    u2, _ = tx2.update(grads, tx2.init(params), params)
    np.testing.assert_allclose(np.asarray(u1['w']), np.asarray(u2['w']))


def test_warmup_cosine_schedule():
    """TINLrUpdaterHook = cosine with linear warmup (reference
    core/lr/tin_lr_hook.py)."""
    sched = build_lr_schedule(
        dict(policy='CosineAnnealing', min_lr=0, by_epoch=False,
             warmup='linear', warmup_iters=10, warmup_ratio=0.1),
        base_lr=1.0, total_iters=100)
    assert float(sched(0)) < 0.2           # warmup start
    assert float(sched(10)) == 1.0         # warmup end
    assert float(sched(100)) < 0.01        # cosine tail
