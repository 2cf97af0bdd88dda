"""Training loop for the temporal-action-localization models
(BMN / TEM / PEM / SSN).

The reference trains these through the same mmcv runner as the trackers
(mmaction/apis/train.py:12-119) with each localizer's ``forward_train``
consuming its own batch keys. Here the tracker loop (apis/train.py) is
imgs-only, so localizers get a parallel functional loop: host-side label
generation per batch (BMN/TEM label maps are data-dependent numpy work,
reference bmn.py:430-470, bsn.py:190-230), then one jitted step over the
fixed-shape tensor batch on a 1-D data mesh.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..checkpoint import latest_checkpoint, restore_checkpoint, \
    save_checkpoint
from ..core.optimizer.builder import build_optimizer
from ..datasets import build_dataloader
from ..parallel import create_mesh, replicated, shard_local_batch
from ..utils import JsonlLogger, get_root_logger
from .train import TrainState

LOCALIZER_TYPES = ('BMN', 'TEM', 'PEM', 'SSN')


def _bmn_prepare(model, batch) -> Dict[str, np.ndarray]:
    # pipeline loads raw_feature channels-first (C, T); model is (N, T, C)
    feats = np.asarray(batch['raw_feature']).transpose(0, 2, 1)
    lc, ls, le = model.generate_labels(batch['gt_bbox'])
    return dict(raw_feature=feats, label_confidence=lc, label_start=ls,
                label_end=le)


def _tem_prepare(model, batch) -> Dict[str, np.ndarray]:
    feats = np.asarray(batch['raw_feature']).transpose(0, 2, 1)
    la, ls, le = model.generate_labels(batch['gt_bbox'])
    return dict(raw_feature=feats, label_action=la, label_start=ls,
                label_end=le)


def _pem_prepare(model, batch) -> Dict[str, np.ndarray]:
    return dict(bsp_feature=np.asarray(batch['bsp_feature'], np.float32),
                reference_temporal_iou=np.asarray(
                    batch['reference_temporal_iou'], np.float32))


def _ssn_prepare(model, batch) -> Dict[str, np.ndarray]:
    return {k: np.asarray(batch[k]) for k in
            ('imgs', 'proposal_scale_factor', 'proposal_type',
             'proposal_labels', 'reg_targets')}


def _bmn_train(m, raw_feature, label_confidence, label_start, label_end,
               rng, train=True):
    cm, start, end = m(raw_feature, train=train)
    return m.loss(cm, start, end, label_confidence, label_start, label_end,
                  rng=rng)


def _tem_train(m, raw_feature, label_action, label_start, label_end, rng,
               train=True):
    out = m(raw_feature, train=train)
    return m.loss(out, label_action, label_start, label_end)


def _pem_train(m, bsp_feature, reference_temporal_iou, rng, train=True):
    # per-sample proposal banks are flattened into one pool, matching the
    # reference's collated (N*P, D) batch
    flat = bsp_feature.reshape(-1, bsp_feature.shape[-1])
    out = m(flat, train=train)
    loss = m.loss(out, reference_temporal_iou.reshape(-1), rng=rng)
    return loss if isinstance(loss, dict) else dict(loss=loss)


def _ssn_train(m, imgs, proposal_scale_factor, proposal_type,
               proposal_labels, reg_targets, rng, train=True):
    return m(imgs, proposal_scale_factor=proposal_scale_factor,
             proposal_type=proposal_type, proposal_labels=proposal_labels,
             reg_targets=reg_targets, train=train, return_loss=True)


_KINDS = {
    'BMN': (_bmn_prepare, _bmn_train),
    'TEM': (_tem_prepare, _tem_train),
    'PEM': (_pem_prepare, _pem_train),
    'SSN': (_ssn_prepare, _ssn_train),
}


def _sum_losses(losses: Dict[str, jnp.ndarray]):
    if 'loss' in losses:
        total = losses['loss']
    else:
        total = sum(v for k, v in losses.items() if 'loss' in k)
        losses = dict(losses, loss=total)
    log_vars = {k: jnp.mean(v) for k, v in losses.items()}
    return jnp.mean(total), log_vars


def make_localizer_train_step(model, tx, kind: str):
    _, fwd = _KINDS[kind]

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            out = model.apply(variables, rngs={'dropout': rng},
                              mutable=['batch_stats'], method=fwd,
                              rng=rng, **batch)
            losses, mutated = out
            total, log_vars = _sum_losses(losses)
            return total, (log_vars, mutated.get('batch_stats',
                                                 state.batch_stats))

        grads, (log_vars, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), log_vars

    return train_step


def make_localizer_eval_step(model, kind: str):
    """Validation loss over one prepared batch — the localizer analogue
    of the reference's ``val`` workflow step. Runs the loss forward in
    EVAL mode (``train=False``: dropout off, BN running stats), matching
    the reference runner's ``model.eval()`` during the val workflow."""
    _, fwd = _KINDS[kind]

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        losses, _ = model.apply(variables, rngs={'dropout': rng},
                                mutable=['batch_stats'], method=fwd,
                                rng=rng, train=False, **batch)
        _, log_vars = _sum_losses(losses)
        return log_vars

    return eval_step


def _init_call_kwargs(kind, tensors):
    if kind == 'PEM':
        flat = tensors['bsp_feature'].reshape(
            -1, tensors['bsp_feature'].shape[-1])
        return (jnp.asarray(flat),), {}
    if kind == 'SSN':
        # SSN's train __call__ needs the full proposal batch to build the
        # head + loss parameter tree
        return ((jnp.asarray(tensors['imgs']),),
                {k: jnp.asarray(v) for k, v in tensors.items()
                 if k != 'imgs'})
    key = {'BMN': 'raw_feature', 'TEM': 'raw_feature'}[kind]
    return (jnp.asarray(tensors[key]),), {}


def train_localizer_model(model, dataset, cfg, validate: bool = False,
                          logger=None) -> TrainState:
    """Train a localizer per config ``cfg`` — the localization analogue of
    ``apis.train.train_model``.

    ``validate=True`` runs a per-epoch validation loss over
    ``cfg.data.val`` (the reference's BMN/BSN ``workflow=[('train',1),
    ('val',1)]`` equivalent), sharded over the same data mesh as
    training and logged under ``mode='val'``."""
    kind = cfg.model['type']
    assert kind in _KINDS, f'not a localizer: {kind}'
    prepare, _ = _KINDS[kind]
    logger = logger or get_root_logger()
    work_dir = cfg.get('work_dir', './work_dirs/default')
    os.makedirs(work_dir, exist_ok=True)
    jsonl = JsonlLogger(os.path.join(work_dir, 'train_log.jsonl'))

    loader = build_dataloader(
        dataset, videos_per_gpu=cfg.data['videos_per_gpu'],
        workers_per_gpu=cfg.data['workers_per_gpu'],
        shuffle=True, drop_last=True, seed=cfg.get('seed', 0) or 0,
        num_shards=jax.process_count(), shard_index=jax.process_index())

    total_epochs = cfg.total_epochs
    iters_per_epoch = max(len(loader), 1)
    grad_clip = None
    if cfg.get('optimizer_config'):
        gc = cfg.optimizer_config.get('grad_clip')
        if gc:
            grad_clip = gc.get('max_norm') if isinstance(gc, dict) else gc
    tx, schedule = build_optimizer(cfg.optimizer, cfg.get('lr_config'),
                                   total_epochs * iters_per_epoch,
                                   iters_per_epoch, grad_clip)

    mesh = create_mesh(('data',))
    rng = jax.random.PRNGKey(cfg.get('seed', 0) or 0)
    _it = iter(loader)
    sample = next(_it)
    _it.close()  # stop the decode workers behind the abandoned iterator
    init_rng, rng = jax.random.split(rng)
    state = _create_state_from_sample(model, init_rng, sample, tx, kind)
    state = jax.device_put(state, replicated(mesh))

    start_epoch = 0
    latest = latest_checkpoint(os.path.join(work_dir, 'checkpoints'))
    if latest and cfg.get('auto_resume', True):
        state = restore_checkpoint(latest, state)
        state = jax.device_put(state, replicated(mesh))
        start_epoch = int(os.path.basename(latest).split('_')[1])
        logger.info(f'auto-resumed from {latest} (epoch {start_epoch})')

    train_step = jax.jit(make_localizer_train_step(model, tx, kind),
                         donate_argnums=(0,))
    log_interval = (cfg.log_config.get('interval', 50)
                    if cfg.get('log_config') else 50)

    val_loader = eval_step = None
    eval_interval = 1
    if validate:
        val_cfg = (cfg.get('data') or {}).get('val')
        if not val_cfg:
            logger.warning('--validate requested but cfg.data.val is '
                           'missing; skipping validation')
            validate = False
        else:
            from ..datasets import build_dataset
            # drop_last=False: every val sample counts (the ragged final
            # batch costs one extra jit shape-compile, once)
            val_loader = build_dataloader(
                build_dataset(val_cfg),
                videos_per_gpu=cfg.data['videos_per_gpu'],
                workers_per_gpu=cfg.data['workers_per_gpu'],
                shuffle=False, drop_last=False,
                num_shards=jax.process_count(),
                shard_index=jax.process_index())
            eval_step = jax.jit(make_localizer_eval_step(model, kind))
            eval_interval = (cfg.get('evaluation') or {}).get('interval', 1)

    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        t_iter = time.time()
        for i, batch in enumerate(loader):
            tensors = prepare(model, batch)
            tensors = shard_local_batch(tensors, mesh)
            rng, step_rng = jax.random.split(rng)
            state, log_vars = train_step(state, tensors, step_rng)
            if (i + 1) % log_interval == 0 or i + 1 == iters_per_epoch:
                log_vars = {k: float(v) for k, v in log_vars.items()}
                lr = schedule(int(state.step)) if callable(schedule) \
                    else schedule
                dt = (time.time() - t_iter) / max(i + 1, 1)
                msg = (f'Epoch [{epoch + 1}][{i + 1}/{iters_per_epoch}] '
                       f'lr: {float(lr):.5f}, time: {dt:.3f}, ' +
                       ', '.join(f'{k}: {v:.4f}'
                                 for k, v in log_vars.items()))
                logger.info(msg)
                jsonl.log(dict(mode='train', epoch=epoch + 1, iter=i + 1,
                               lr=float(lr), time=dt, **log_vars))
        if jax.process_index() == 0:
            interval = (cfg.checkpoint_config.get('interval', 1)
                        if cfg.get('checkpoint_config') else 1)
            if (epoch + 1) % interval == 0 or epoch + 1 == total_epochs:
                path = save_checkpoint(
                    os.path.join(work_dir, 'checkpoints'), epoch + 1,
                    jax.device_get(state))
                logger.info(f'checkpoint saved to {path}')
        if validate and (epoch + 1) % eval_interval == 0:
            sums: Dict[str, float] = {}
            n_samples = 0
            val_rng = jax.random.PRNGKey(0)  # fixed: comparable epochs
            for batch in val_loader:
                bn = len(next(iter(batch.values())))
                tensors = shard_local_batch(prepare(model, batch), mesh)
                log_vars = eval_step(state, tensors, val_rng)
                # weight per-batch means by batch size so the ragged
                # final batch doesn't overweight its samples (the
                # reference LogBuffer averages the same way)
                for k, v in log_vars.items():
                    sums[k] = sums.get(k, 0.0) + float(v) * bn
                n_samples += bn
            if n_samples:
                means = {k: v / n_samples for k, v in sums.items()}
                msg = ', '.join(f'{k}: {v:.4f}' for k, v in means.items())
                logger.info(f'Epoch [{epoch + 1}] val ({n_samples} '
                            f'samples): ' + msg)
                jsonl.log(dict(mode='val', epoch=epoch + 1, **means))
            else:
                logger.warning('validation loader produced no batches')
    return state


def _create_state_from_sample(model, rng, sample, tx, kind) -> TrainState:
    prepare, _ = _KINDS[kind]
    tensors = prepare(model, sample)
    args, kwargs = _init_call_kwargs(kind, tensors)
    init_rng, dropout_rng = jax.random.split(rng)
    variables = model.init({'params': init_rng, 'dropout': dropout_rng},
                           *args, train=True, **kwargs)
    params = variables['params']
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get('batch_stats', {}),
                      opt_state=tx.init(params))
