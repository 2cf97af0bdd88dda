"""Training loop (reference: mmaction/apis/train.py:12-119 + the external
mmcv EpochBasedRunner it delegates to — here a single functional loop).

TPU-first: one jitted train_step over a 1-D data mesh. The batch is sharded
on the ``data`` axis; parameters/optimizer state are replicated; XLA GSPMD
inserts gradient all-reduces and makes BatchNorm statistics global
(= reference SyncBN + DDP). Checkpoints via orbax each epoch with
auto-resume (reference CheckpointHook + --auto-resume).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..checkpoint import latest_checkpoint, restore_checkpoint, \
    save_checkpoint
from ..core.optimizer.builder import build_optimizer
from ..datasets import build_dataloader
from ..models.trackers.sim_siam_tracker import parse_losses
from ..parallel import create_mesh, replicated, shard_batch, \
    shard_local_batch
from ..utils import JsonlLogger, get_root_logger


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def model_takes_labels(model) -> bool:
    """Recognizers consume (imgs, labels); SimSiam trackers are
    self-supervised and take imgs only."""
    import inspect
    return 'labels' in inspect.signature(type(model).__call__).parameters


def create_train_state(model, rng, sample_batch, tx,
                       aug_out_hw: Optional[Tuple[int, int]] = None
                       ) -> TrainState:
    imgs = jnp.asarray(sample_batch['imgs'][:1])
    if aug_out_hw is not None:
        # on-device augmentation: the model sees post-crop frames, not
        # the staging shape the loader ships
        b, n, t = imgs.shape[:3]
        imgs = jnp.zeros((b, n, t) + tuple(aug_out_hw) + imgs.shape[-1:],
                         jnp.float32)
    elif imgs.dtype == jnp.uint8:  # on-device-normalize: init on floats
        imgs = imgs.astype(jnp.float32)
    args = (imgs,)
    if model_takes_labels(model) and 'label' in sample_batch:
        args = (imgs, jnp.asarray(sample_batch['label'][:1]))
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init({'params': p_rng, 'dropout': d_rng}, *args,
                           train=True)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)


def apply_mixed_precision(cfg) -> bool:
    """Rewrite a model config for bf16 mixed precision when the config
    carries the reference's ``fp16 = dict(...)`` key (or ``bf16 = True``).

    TPU-native equivalent of ``Fp16OptimizerHook`` + ``wrap_fp16_model``
    (reference mmaction/apis/train.py:83-86): the backbone modules get an
    explicit flax ``dtype=bfloat16`` — compute (conv/BN normalise/ReLU)
    runs in bf16 on the MXU while parameters stay fp32 (flax
    ``param_dtype``) and BatchNorm statistics are computed and stored in
    fp32. Heads/losses keep fp32 (fp32 params promote bf16 features up),
    mirroring the reference keeping the loss in fp32. bf16's fp32-sized
    exponent removes the need for loss scaling — ``loss_scale`` keys are
    accepted and ignored. Returns True if mixed precision was enabled.

    Call before ``build_model`` (mutates ``cfg.model.backbone``).
    """
    mixed = bool(cfg.get('fp16') is not None or cfg.get('bf16'))
    if mixed and isinstance(cfg.get('model'), dict):
        backbone = cfg.model.get('backbone')
        if isinstance(backbone, dict):
            from ..models.registry import BACKBONES
            klass = BACKBONES.get(backbone.get('type'))
            if klass is not None and hasattr(klass, 'dtype'):
                backbone.setdefault('dtype', jnp.bfloat16)
            else:
                from ..utils import get_root_logger
                get_root_logger().warning(
                    f'fp16/bf16 requested but backbone '
                    f'{backbone.get("type")!r} has no dtype plumbing; '
                    f'backbone compute stays fp32')
    return mixed


def make_train_step(model, tx, mixed_precision: bool = False,
                    norm_cfg: Optional[Dict] = None, seed: int = 0,
                    device_aug=None):
    """Build the jitted train step.

    ``mixed_precision=True`` pairs with :func:`apply_mixed_precision`
    (which sets the backbone's flax dtype to bf16): the batch is cast to
    bf16 at the loss boundary, the loss is accumulated in fp32, and any
    BatchNorm statistic a bf16-dtyped module produced is cast back to
    the master (fp32) dtype so the running stats never drift to half
    precision. Master params and the optimizer are always fp32.

    ``norm_cfg`` (dict with 'mean'/'std') enables the uint8 input path:
    a train pipeline using ``Normalize(..., on_device=True)`` ships raw
    uint8 frames (4x less loader->device traffic) and the step performs
    the numerically identical (x - mean) / std here. float batches pass
    through untouched, so the host-normalized path is unaffected.
    """
    half = jnp.bfloat16
    norm_mean = norm_std = None
    if norm_cfg is not None:
        norm_mean = jnp.asarray(norm_cfg['mean'], jnp.float32)
        norm_std = jnp.asarray(norm_cfg['std'], jnp.float32)
    # Seeded from the config so seed sweeps decorrelate dropout too;
    # folded with the step counter for a fresh mask every step, and with
    # the process index so multi-host shards draw independent aug/dropout
    # params (the reference decorrelates via per-worker seeds,
    # datasets/builder.py:111-117).
    dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed),
                                     jax.process_index())
    aug_rng = jax.random.fold_in(dropout_rng, 0x617567)  # 'aug' stream

    def train_step(state: TrainState, imgs, labels=None, orig_hw=None):
        def loss_fn(params):
            x = imgs
            if device_aug is not None:
                # full augmentation chain on device (crop/flip/jitter/
                # blur/normalize — see ops/device_aug.py)
                x = device_aug(x, orig_hw,
                               jax.random.fold_in(aug_rng, state.step))
            elif x.dtype == jnp.uint8:
                if norm_mean is None:
                    raise ValueError(
                        'uint8 train batch needs img_norm_cfg (pipeline '
                        'used Normalize(on_device=True) but the config '
                        'has no img_norm_cfg)')
                x = (x.astype(jnp.float32) - norm_mean) / norm_std
            x = x.astype(half) if mixed_precision else x
            args = (x,) if labels is None else (x, labels)
            outputs, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                *args, train=True, mutable=['batch_stats'],
                rngs={'dropout': jax.random.fold_in(dropout_rng,
                                                    state.step)})
            total, log_vars = parse_losses(outputs)
            new_stats = jax.tree.map(
                lambda new, old: new.astype(jnp.asarray(old).dtype),
                mutated['batch_stats'], state.batch_stats)
            return total.astype(jnp.float32), (log_vars, new_stats)

        grads, (log_vars, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, log_vars

    return train_step


def _load_backbone_pretrained(state: TrainState, cfg, logger) -> TrainState:
    """Honor ``cfg.model.backbone.pretrained`` for the train path — the
    reference's BaseTracker.init_weights loads it through the backbone's
    torchvision loader (trackers/base.py:47, resnet.py:437); here the
    bridge drops the weights into the '_backbone' collection after
    functional init. No-op when the key is absent/None."""
    backbone = (cfg.get('model') or {}).get('backbone') \
        if isinstance(cfg.get('model'), dict) else None
    pre = (backbone or {}).get('pretrained')
    if not pre:
        return state
    if backbone.get('type') != 'ResNet':
        raise ValueError(
            f"backbone.pretrained={pre!r} is only supported for the 2D "
            f"ResNet backbone (the torchvision layout the bridge maps); "
            f"got type={backbone.get('type')!r} — load weights explicitly "
            f"or drop the key")
    if '_backbone' not in state.params:
        logger.warning(f'backbone.pretrained={pre!r} set but the model '
                       "has no '_backbone' collection; not loaded")
        return state
    from ..checkpoint import load_torchvision_resnet
    params, stats = load_torchvision_resnet(pre)
    # the checkpoint must actually fit this backbone (same tree + shapes)
    # — installing a mismatched tree would surface later as a confusing
    # optax/apply structure error
    want = jax.tree.map(jnp.shape, state.params['_backbone'])
    got = jax.tree.map(jnp.shape, params)
    if want != got:
        raise ValueError(
            f'pretrained checkpoint {pre!r} does not match the '
            f'configured backbone (depth/width mismatch?)')
    new_params = dict(state.params)
    new_params['_backbone'] = params
    new_stats = dict(state.batch_stats)
    new_stats['_backbone'] = stats
    logger.info(f'initialized backbone from pretrained {pre}')
    return state._replace(params=type(state.params)(new_params),
                          batch_stats=type(state.batch_stats)(new_stats))


def _pipeline_norm_cfg(dataset) -> Optional[Dict]:
    """The mean/std the train pipeline's ``Normalize`` actually applies.

    The uint8 on-device normalize must use THESE constants — the
    top-level ``cfg.img_norm_cfg`` is only a convention and can
    legitimately differ from what the pipeline was built with (e.g. a
    dict reused for another modality). Unwraps dataset wrappers
    (RepeatDataset et al.) via their ``.dataset`` attribute."""
    from ..datasets.pipelines.augmentations import Normalize
    ds = dataset
    while not hasattr(ds, 'pipeline') and hasattr(ds, 'dataset'):
        ds = ds.dataset
    for t in getattr(getattr(ds, 'pipeline', None), 'transforms', []):
        if isinstance(t, Normalize):
            return dict(mean=t.mean, std=t.std)
    return None


def train_model(model, dataset, cfg, validate: bool = False,
                logger=None, local_devices=None) -> TrainState:
    """Train ``model`` (a flax Module with loss-dict __call__) on
    ``dataset`` per config ``cfg`` (reference apis/train.py:12-119).

    ``local_devices``: devices to shard the validation eval over
    (reference DistEvalHook parity — see :func:`build_val_eval_fn`)."""
    logger = logger or get_root_logger()
    work_dir = cfg.get('work_dir', './work_dirs/default')
    os.makedirs(work_dir, exist_ok=True)
    jsonl = JsonlLogger(os.path.join(work_dir, 'train_log.jsonl'))
    from ..utils import build_wandb_logger
    wandb_log = build_wandb_logger(cfg.get('log_config'))

    data_cfg = cfg.data
    loader = build_dataloader(
        dataset,
        videos_per_gpu=data_cfg['videos_per_gpu'],
        workers_per_gpu=data_cfg['workers_per_gpu'],
        shuffle=True, drop_last=True, seed=cfg.get('seed', 0) or 0,
        num_shards=jax.process_count(), shard_index=jax.process_index())

    total_epochs = cfg.total_epochs
    iters_per_epoch = len(loader)
    total_iters = total_epochs * iters_per_epoch
    grad_clip = None
    if cfg.get('optimizer_config'):
        gc = cfg.optimizer_config.get('grad_clip')
        if gc:
            grad_clip = gc.get('max_norm', None) if isinstance(gc, dict) \
                else gc
    tx, schedule = build_optimizer(cfg.optimizer, cfg.get('lr_config'),
                                   total_iters, iters_per_epoch, grad_clip)

    mesh = create_mesh(('data',))
    rng = jax.random.PRNGKey(cfg.get('seed', 0) or 0)

    # on-device augmentation (cfg.device_aug = dict(transforms=[...])):
    # the loader ships uint8 staging frames (pipeline DeviceAug) and the
    # whole crop/flip/jitter/blur/normalize chain runs in the train step
    norm_cfg = _pipeline_norm_cfg(dataset) or cfg.get('img_norm_cfg')
    device_aug = None
    aug_out_hw = None
    if cfg.get('device_aug'):
        from ..ops.device_aug import build_device_aug
        da = dict(cfg.device_aug)
        device_aug = build_device_aug(
            da['transforms'], da.get('img_norm_cfg') or norm_cfg,
            out_hw=tuple(da.get('out_hw', (224, 224))))
        aug_out_hw = device_aug.out_hw  # a Resize in the chain wins
        logger.info('on-device augmentation enabled '
                    f'({len(da["transforms"])} transforms -> {aug_out_hw})')

    # init on a sample batch (close the iterator so its decode workers
    # stop instead of racing the real epoch loop for CPU)
    _it = iter(loader)
    sample = next(_it)
    _it.close()
    state = create_train_state(model, rng, sample, tx,
                               aug_out_hw=aug_out_hw)
    state = _load_backbone_pretrained(state, cfg, logger)
    state = jax.device_put(state, replicated(mesh))

    # auto-resume (reference tools/train.py:103-105)
    start_epoch = 0
    latest = latest_checkpoint(os.path.join(work_dir, 'checkpoints'))
    if latest and cfg.get('auto_resume', True):
        state = restore_checkpoint(latest, state)
        state = jax.device_put(state, replicated(mesh))
        start_epoch = int(os.path.basename(latest).split('_')[1])
        logger.info(f'auto-resumed from {latest} (epoch {start_epoch})')

    # fp16 = dict(...) in a reference config requests mixed precision;
    # on TPU that means bf16 compute (loss_scale keys are accepted and
    # ignored — bf16 needs none). The backbone dtype rewrite happens in
    # apply_mixed_precision() before the model is built (tools/train.py).
    mixed = bool(cfg.get('fp16') is not None or cfg.get('bf16'))
    if mixed:
        logger.info('mixed precision enabled: bf16 compute, fp32 master '
                    'params (fp16 config key maps to bf16 on TPU)')
    train_step = jax.jit(make_train_step(model, tx, mixed_precision=mixed,
                                         norm_cfg=norm_cfg,
                                         seed=cfg.get('seed', 0) or 0,
                                         device_aug=device_aug),
                         donate_argnums=(0,))

    log_interval = 50
    if cfg.get('log_config'):
        log_interval = cfg.log_config.get('interval', 50)

    eval_hook = None
    if validate and cfg.get('data') and cfg.data.get('val'):
        from ..core.evaluation.eval_hooks import EvalHook
        eval_cfg = dict(cfg.get('evaluation') or {})
        state_box = {'state': state}
        eval_hook = EvalHook(
            build_val_eval_fn(cfg, lambda: state_box['state'],
                              local_devices=local_devices),
            interval=eval_cfg.get('interval', 1),
            key_indicator=eval_cfg.get('key_indicator'),
            rule=eval_cfg.get('rule'), work_dir=work_dir)

    # --profile N: jax.profiler trace of steps [2, 2+N) after the compile
    # step (SURVEY §5 tracing row; reference has only offline benchmark
    # tools — on TPU a device trace is the native equivalent).
    profile_steps = max(0, int(cfg.get('profile_steps', 0) or 0))
    profile_dir = os.path.join(work_dir, 'profile')
    steps_run = 0
    trace_active = False

    takes_labels = model_takes_labels(model)
    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        t_iter = time.time()
        for i, batch in enumerate(loader):
            feed = {'imgs': batch['imgs']}
            if takes_labels and 'label' in batch:
                feed['label'] = np.asarray(batch['label'])
            if device_aug is not None:
                feed['orig_hw'] = np.asarray(batch['orig_hw'])
            # the loader yields this PROCESS's shard; assemble the
            # global batch from the per-process locals (shard_batch
            # would treat them as identical replicas and desync GSPMD)
            feed = shard_local_batch(feed, mesh)
            imgs, labels = feed['imgs'], feed.get('label')
            if profile_steps and steps_run == 2:
                try:
                    jax.profiler.start_trace(profile_dir)
                    trace_active = True
                    logger.info(f'profiler trace started -> {profile_dir}')
                except Exception as e:  # backend may not support tracing
                    logger.warning(f'profiler unavailable: {e}')
                    profile_steps = 0
            state, log_vars = train_step(state, imgs, labels,
                                         feed.get('orig_hw'))
            steps_run += 1
            if trace_active and steps_run >= 2 + profile_steps:
                jax.block_until_ready(state.step)
                jax.profiler.stop_trace()
                trace_active = False
                logger.info(f'profiler trace ({profile_steps} steps) '
                            f'written to {profile_dir}')
            if (i + 1) % log_interval == 0:
                log_vars = {k: float(v) for k, v in log_vars.items()}
                step = int(state.step)
                lr = schedule(step) if callable(schedule) else schedule
                dt = (time.time() - t_iter) / log_interval
                t_iter = time.time()
                msg = (f'Epoch [{epoch + 1}][{i + 1}/{iters_per_epoch}] '
                       f'lr: {float(lr):.5f}, time: {dt:.3f}, ' +
                       ', '.join(f'{k}: {v:.4f}'
                                 for k, v in log_vars.items()))
                logger.info(msg)
                entry = dict(mode='train', epoch=epoch + 1, iter=i + 1,
                             lr=float(lr), time=dt, **log_vars)
                jsonl.log(entry)
                if wandb_log is not None:
                    wandb_log.log(entry, step=step)
        ckpt_interval = 1
        if cfg.get('checkpoint_config'):
            ckpt_interval = cfg.checkpoint_config.get('interval', 1)
        if (epoch + 1) % ckpt_interval == 0 or epoch + 1 == total_epochs:
            # EVERY process must enter the save: orbax synchronizes
            # globally inside (rank-gating it desynchronizes the
            # collective streams — caught by the 2-process full-loop
            # test); orbax itself makes non-zero ranks no-op writers
            path = save_checkpoint(
                os.path.join(work_dir, 'checkpoints'), epoch + 1,
                jax.device_get(state))
            if jax.process_index() == 0:
                logger.info(f'checkpoint saved to {path}')
        if validate and eval_hook is not None:
            state_box['state'] = state
            results = eval_hook.after_epoch(epoch)
            if results:
                entry = dict(mode='val', epoch=epoch + 1, **{
                    k: float(v) for k, v in results.items()
                    if isinstance(v, (int, float))})
                jsonl.log(entry)
                if wandb_log is not None:
                    wandb_log.log(entry, step=int(state.step))
    if trace_active:  # fewer steps than requested: close the trace anyway
        jax.profiler.stop_trace()
        logger.info(f'profiler trace written to {profile_dir}')
    if wandb_log is not None:
        wandb_log.finish()
    return state


def build_val_eval_fn(cfg, state_getter, local_devices=None):
    """Build an eval_fn running the propagation eval on ``cfg.data.val``
    with the CURRENT training backbone weights (the wiring the reference
    has but never enables: apis/train.py:99-113, tools/train.py:175).

    Sharding (reference DistEvalHook, eval_hooks.py:135): under multiple
    JAX processes the videos are sharded per host and the predictions
    allgathered (``multi_process_test``); on a multi-chip host pass
    ``local_devices`` (list of ``jax.Device``) to round-robin the videos
    over the chips instead (``single_process_test(devices=...)``).
    """
    from ..datasets import build_dataset
    from ..models import build_model
    from .test import multi_process_test, single_process_test

    dataset = build_dataset(cfg.data.val, dict(test_mode=True))
    tracker = build_model(
        dict(type='VanillaTracker', backbone=dict(cfg.model.backbone)),
        test_cfg=cfg.test_cfg)

    def eval_fn():
        state = state_getter()
        # The train model (SimSiamBaseTracker) must expose its backbone
        # under the '_backbone' collection key for the weight hand-off —
        # a silent miss here would evaluate freshly-initialised weights.
        if not (hasattr(state.params, 'keys')
                and '_backbone' in state.params):
            raise KeyError(
                "validation weight hand-off: expected '_backbone' in "
                f'train params (found keys {list(state.params.keys())!r}); '
                'did the tracker rename its backbone submodule?')
        params = state.params['_backbone']
        stats = state.batch_stats.get('_backbone', {}) \
            if hasattr(state.batch_stats, 'get') else {}
        tracker.variables = {'params': params, 'batch_stats': stats}
        import jax as _jax
        if _jax.process_count() > 1:
            results = multi_process_test(tracker, dataset)
        else:
            results = single_process_test(tracker, dataset, progress=False,
                                          devices=local_devices)
        metrics = cfg.evaluation.get('metrics', 'davis') \
            if cfg.get('evaluation') else 'davis'
        return dataset.evaluate(results, metrics=metrics)

    return eval_fn
