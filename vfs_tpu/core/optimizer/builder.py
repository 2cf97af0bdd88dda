"""Optimizer + LR schedule builders (optax).

Mirrors the reference's mmcv optimizer/lr hook configs
(reference configs: ``optimizer = dict(type='SGD', lr=.05, momentum=.9,
weight_decay=1e-4)``; ``lr_config = dict(policy='CosineAnnealing',
min_lr=0, by_epoch=False)``). Torch-SGD parity: weight decay is *coupled*
(added to the gradient before the momentum buffer), so the chain is
add_decayed_weights -> trace(momentum) -> scale(-lr).
"""

from __future__ import annotations

from typing import Dict, Optional

import optax


def build_lr_schedule(lr_config: Optional[Dict], base_lr: float,
                      total_iters: int, iters_per_epoch: int = 1):
    if lr_config is None:
        return base_lr
    cfg = dict(lr_config)
    policy = cfg.pop('policy', 'fixed')
    by_epoch = cfg.pop('by_epoch', True)
    warmup = cfg.pop('warmup', None)
    warmup_iters = cfg.pop('warmup_iters', 0)
    warmup_ratio = cfg.pop('warmup_ratio', 0.1)
    raw_warmup_iters = warmup_iters  # mmcv semantics: always iterations
    if by_epoch and warmup_iters:
        warmup_iters *= iters_per_epoch

    if policy.lower() == 'tin':
        # Replicates the reference TINLrUpdaterHook
        # (reference mmaction/core/lr/tin_lr_hook.py:1-45): cosine annealing
        # whose progress is SHIFTED by warmup_iters (negative during warmup),
        # multiplied during warmup by the TIN ramp
        # k = warmup_ratio + (1-warmup_ratio)*i/warmup_iters (linear),
        # k = warmup_ratio (constant) or k = warmup_ratio**(1-i/wu) (exp).
        # Reference quirk kept: with by_epoch=True, get_lr subtracts the
        # *iteration*-denominated warmup_iters from the *epoch* progress
        # (tin_lr_hook.py:35-38) — units deliberately mixed to match.
        import jax.numpy as jnp
        min_lr = cfg.pop('min_lr', 0.0)
        wu = raw_warmup_iters  # iteration-denominated, as in mmcv
        max_epochs = total_iters / max(iters_per_epoch, 1)

        def tin_schedule(count):
            i = jnp.asarray(count, jnp.float32)
            if by_epoch:
                progress = jnp.floor(i / iters_per_epoch)
                max_progress = float(max_epochs)
            else:
                progress = i
                max_progress = float(total_iters)
            if warmup is not None:
                progress = progress - wu
                max_progress = max_progress - wu
            factor = progress / max_progress
            reg = min_lr + 0.5 * (base_lr - min_lr) * (
                jnp.cos(jnp.pi * factor) + 1.0)
            if warmup == 'linear':
                k = (i / wu) * (1 - warmup_ratio) + warmup_ratio
            elif warmup == 'constant':
                k = jnp.asarray(warmup_ratio, jnp.float32)
            elif warmup == 'exp':
                k = warmup_ratio ** (1 - i / wu)
            else:
                return reg
            return jnp.where(i < wu, reg * k, reg)

        return tin_schedule

    if policy.lower() in ('cosineannealing', 'cosine'):
        min_lr = cfg.pop('min_lr', 0.0)
        sched = optax.cosine_decay_schedule(
            init_value=base_lr, decay_steps=max(total_iters - warmup_iters, 1),
            alpha=min_lr / base_lr if base_lr else 0.0)
    elif policy.lower() == 'step':
        steps = cfg.pop('step')
        gamma = cfg.pop('gamma', 0.1)
        if not isinstance(steps, (list, tuple)):
            steps = [steps]
        boundaries = {}
        scale = 1.0
        for s in steps:
            it = s * iters_per_epoch if by_epoch else s
            scale *= gamma
            boundaries[int(it)] = gamma
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif policy.lower() in ('fixed',):
        sched = base_lr
    elif policy.lower() in ('exp', 'exponential'):
        gamma = cfg.pop('gamma')
        sched = optax.exponential_decay(
            base_lr, decay_rate=gamma,
            transition_steps=iters_per_epoch if by_epoch else 1)
    else:
        raise KeyError(f'unknown lr policy {policy}')

    if warmup is not None and warmup_iters > 0:
        assert warmup == 'linear'
        warm = optax.linear_schedule(base_lr * warmup_ratio, base_lr,
                                     warmup_iters)
        sched = optax.join_schedules([warm, sched], [warmup_iters])
    return sched


def build_optimizer(optimizer_cfg: Dict, lr_config: Optional[Dict] = None,
                    total_iters: int = 1, iters_per_epoch: int = 1,
                    grad_clip: Optional[float] = None):
    """cfg -> optax.GradientTransformation. Returns (tx, schedule)."""
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type')
    base_lr = cfg.pop('lr')
    schedule = build_lr_schedule(lr_config, base_lr, total_iters,
                                 iters_per_epoch)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if opt_type == 'SGD':
        wd = cfg.pop('weight_decay', 0.0)
        momentum = cfg.pop('momentum', 0.0)
        nesterov = cfg.pop('nesterov', False)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
        chain.append(optax.scale_by_learning_rate(schedule))
    elif opt_type == 'Adam':
        wd = cfg.pop('weight_decay', 0.0)
        betas = cfg.pop('betas', (0.9, 0.999))
        eps = cfg.pop('eps', 1e-8)
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_learning_rate(schedule))
    elif opt_type == 'AdamW':
        wd = cfg.pop('weight_decay', 0.01)
        betas = cfg.pop('betas', (0.9, 0.999))
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
        chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_learning_rate(schedule))
    else:
        raise KeyError(f'unknown optimizer {opt_type}')
    return optax.chain(*chain), schedule
