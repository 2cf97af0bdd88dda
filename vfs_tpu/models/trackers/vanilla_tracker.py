"""VanillaTracker: inference-only label-propagation model.

Functional re-design of the reference VanillaTracker
(reference: mmaction/models/trackers/vanilla_tracker.py:16-206):

  - feature bank extraction runs the backbone over frame chunks inside one
    jit (``lax.map``) — the bank stays in HBM (the reference offloads to CPU
    in chunks of ``batch_step`` frames, :55-75 — default 20:
    measured 1.5x faster extraction than 10 with zero extra padding,
    PROGRESS r3);
  - the frame loop is ``vfs_tpu.ops.propagation.propagate_video`` (a single
    ``lax.scan``) instead of a python loop with CPU<->GPU bank traffic;
  - decode (bilinear upsample + min-max normalize + argmax) happens on
    device per frame (:162-181 parity);
  - videos are padded in T to bucket sizes so XLA compiles once per bucket.

``test_cfg`` keys mirror the reference configs (configs/r18_nc...py:27-36):
precede_frames, topk, temperature, strides, out_indices, neighbor_range,
with_first, with_first_neighbor, all_blocks, save_np, batch_step, with_norm.
TPU-side extras: extract_bulk_step (bulk conv-batch size decoupled from the
T padding granularity, see ``_extract_feats``), backend, pallas_precision,
input_format, pack_preds.
"""

from __future__ import annotations

import functools
import math
import os
import os.path as osp
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.propagation import PropagationConfig, propagate_video
from ...ops.affinity import spatial_neighbor
from ...ops.resize import pil_nearest_resize, resize_bilinear
from ...utils import get_root_logger
from .. import builder
from ..common.utils import normalize_logit
from ..registry import TRACKERS


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_propagation_config(test_cfg: Dict, h: int, w: int):
    """Resolve the production ``PropagationConfig`` (+ dense mask when the
    locality kernels don't apply) from reference-style ``test_cfg`` keys
    at feature grid ``(h, w)``. Shared by ``forward_test`` and the stage
    benchmarks (bench.py measures propagation with exactly this config).
    """
    neighbor_range = test_cfg.get('neighbor_range', None)
    with_first_neighbor = bool(test_cfg.get('with_first_neighbor', True))
    with_norm = bool(test_cfg.get('with_norm', True))
    # the tiled locality kernel covers the default configuration;
    # fall back to the dense masked path otherwise
    use_local = (neighbor_range is not None and with_first_neighbor
                 and with_norm)
    mask = None
    if neighbor_range is not None and not use_local:
        mask = spatial_neighbor(h, w, neighbor_range, mode='circle')

    # 'pallas_video' (round 4): whole-video kernel with the key
    # ring resident in VMEM + decoupled value gather — measured
    # 3.49 ms/frame vs 6.88 for the per-step scan kernel at r18
    # DAVIS-480p shapes (bench_kernel, v5e), argmax-exact vs the
    # fp32 tiers. Protocols whose full-bank ring exceeds VMEM
    # (r50's radius-18 C=1024) run the bank-split variant
    # automatically (video_bank_splits=None -> smallest fitting
    # count).
    default_backend = ('pallas_video'
                       if jax.default_backend() == 'tpu' else 'tiled')
    backend = test_cfg.get('backend', default_backend)
    # scan-kernel tiling: wide circle masks (r50's
    # neighbor_range=36) amortize the halo better with a wider
    # tile (41.3 vs 45.8 ms/frame at radius 18; bit-exact at
    # radius 12). The video kernel measured fastest at (8, 8)
    # (3.49 vs 4.11 for (16, 8)) and its VMEM-resident ring only
    # fits r50's radius-18 blocks at (8, 8).
    if backend == 'pallas_video':
        pallas_tile = (8, 8)
    else:
        pallas_tile = (8, 16) if (use_local
                                  and neighbor_range // 2 >= 16) \
            else (8, 8)
    cfg = PropagationConfig(
        precede_frames=int(test_cfg.get('precede_frames', 20)),
        topk=int(test_cfg.get('topk', 10)),
        temperature=float(test_cfg.get('temperature', 1.0)),
        with_first=bool(test_cfg.get('with_first', True)),
        with_first_neighbor=with_first_neighbor,
        with_norm=with_norm,
        neighbor_range=int(neighbor_range) if use_local else None,
        backend=backend,
        pallas_tile=tuple(test_cfg.get('pallas_tile', pallas_tile)),
        pallas_scores=test_cfg.get('pallas_scores', 'float32'),
        pallas_fetch=test_cfg.get('pallas_fetch', 'perframe'),
        pallas_precision=test_cfg.get('pallas_precision', 'float32'),
        pallas_matmul=test_cfg.get('pallas_matmul', 'perframe'),
        pallas_group_frames=test_cfg.get('pallas_group_frames'),
        pallas_extract=test_cfg.get('pallas_extract', 'mask'),
        video_extract=test_cfg.get('video_extract', 'sweep'),
        video_early_exit=bool(test_cfg.get('video_early_exit', True)),
        video_bank_splits=test_cfg.get('video_bank_splits'),
        video_sweep_rows=int(test_cfg.get('video_sweep_rows', 1)),
        video_pass_mode=test_cfg.get('video_pass_mode', 'maxfirst'),
        video_engine=test_cfg.get('video_engine', 'v2'),
        video_qpair=int(test_cfg.get('video_qpair', 0)),
        video_compact=bool(test_cfg.get('video_compact', True)))
    return cfg, mask


@TRACKERS.register_module()
class VanillaTracker:
    """Pixel tracker: propagate first-frame labels through a video.

    Not a flax module — it orchestrates jitted functions over an explicit
    (params, batch_stats) state, which is the JAX-native shape of the
    reference's nn.Module (weights are data, not object state).
    """

    def __init__(self, backbone: Dict, train_cfg: Optional[Dict] = None,
                 test_cfg: Optional[Dict] = None, **kwargs):
        test_cfg = dict(test_cfg or {})
        self.test_cfg = test_cfg
        self.train_cfg = train_cfg
        backbone = dict(backbone)
        self.pretrained = backbone.pop('pretrained', None)
        # the reference rebuilds the backbone with test-time strides /
        # out_indices (tools/test.py:129-133); in JAX those are just static
        # constructor args.
        if 'strides' in test_cfg:
            backbone['strides'] = tuple(test_cfg['strides'])
        if 'out_indices' in test_cfg:
            backbone['out_indices'] = tuple(test_cfg['out_indices'])
        self.backbone_cfg = backbone
        self.all_blocks = test_cfg.get('all_blocks', False)
        if self.all_blocks:
            from ..backbones.resnet import ResNetBlockwise
            cfg = dict(backbone)
            cfg.pop('type', None)
            self.backbone = ResNetBlockwise(**cfg)
        else:
            self.backbone = builder.build_backbone(backbone)
        self.save_np = test_cfg.get('save_np', False)
        self.variables = None  # set via load_weights / init_weights

    # -- weights ----------------------------------------------------------
    def init_weights(self, rng: Optional[jax.Array] = None,
                     input_shape=(1, 64, 64, 3)):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.variables = self.backbone.init(
            rng, jnp.zeros(input_shape, jnp.float32), train=False)
        if self.pretrained:
            self.load_weights(self.pretrained)
        return self.variables

    def load_weights(self, path: str):
        from ...checkpoint import load_torchvision_resnet
        params, stats = load_torchvision_resnet(path)
        self.variables = {'params': params, 'batch_stats': stats}
        get_root_logger().info(f'Loaded backbone weights from {path}')
        return self.variables

    @property
    def stride(self) -> int:
        """Total output stride of the eval feature (reference
        vanilla_tracker.py:24-28)."""
        end_index = self.backbone.out_indices[0]
        out = 4
        for s in self.backbone.strides[:end_index + 1]:
            out *= s
        return out

    # -- jitted stages ----------------------------------------------------
    @functools.partial(jax.jit,
                       static_argnames=('self', 'batch_step', 'yuv_hw',
                                        'bulk_step'))
    def _extract_feats(self, variables, imgs: jnp.ndarray, batch_step: int,
                       norm_mean=None, norm_std=None, yuv_hw=None,
                       bulk_step: int = 0):
        """imgs (T, H, W, 3) -> tuple of (T, h, w, c) feature banks.

        T must be a multiple of batch_step; runs the backbone per chunk
        inside lax.map (reference get_feats, vanilla_tracker.py:55-75).
        uint8 inputs are normalized on device (ships 4x less data over the
        host link than pre-normalized float32). ``yuv_hw=(H, W)`` means
        ``imgs`` is the flat planar-I420 transport layout (1.5 bytes/px —
        another 2x fewer link bytes; see ops/yuv.py): the chroma
        upsample + BT.601 inverse fuse into this jit ahead of conv1.

        ``bulk_step`` (a multiple of ``batch_step``, 0 = off) decouples
        the conv batch from the T-padding granularity: the bulk of the
        video runs in ``bulk_step``-frame chunks (larger conv batches use
        the MXU better — measured 0.47 vs 0.70 ms/frame at 40 vs 20,
        PROGRESS r3) while T still pads only to ``batch_step`` multiples,
        so propagation never sees the extra padded frames a uniform
        bulk-sized batch would force; the <=(bulk_step - batch_step)
        tail runs at ``batch_step``."""

        def fwd(chunk):
            if yuv_hw is not None:
                from ...ops.yuv import yuv420_to_rgb
                chunk = yuv420_to_rgb(chunk, *yuv_hw)  # (h, w, convention)
                chunk = (chunk - norm_mean) / norm_std
            elif chunk.dtype == jnp.uint8:
                chunk = (chunk.astype(jnp.float32) - norm_mean) / norm_std
            outs = self.backbone.apply(variables, chunk, train=False)
            outs = outs if isinstance(outs, tuple) else (outs,)
            # a bf16-dtyped backbone (model.backbone.dtype=bfloat16, the
            # eval speed knob) yields bf16 features; propagation math and
            # the pallas kernel buffers are fp32 (top-k parity), so cast
            # at this seam
            return tuple(o.astype(jnp.float32) for o in outs)

        def run(part, step):
            t = part.shape[0]
            chunks = part.reshape(t // step, step, *part.shape[1:])
            outs = jax.lax.map(fwd, chunks)
            return tuple(o.reshape(t, *o.shape[2:]) for o in outs)

        t = imgs.shape[0]
        if bulk_step and bulk_step > batch_step and t >= bulk_step:
            assert bulk_step % batch_step == 0, (bulk_step, batch_step)
            t_bulk = (t // bulk_step) * bulk_step
            bulk = run(imgs[:t_bulk], bulk_step)
            if t_bulk == t:
                return bulk
            tail = run(imgs[t_bulk:], batch_step)
            return tuple(jnp.concatenate([b, s], axis=0)
                         for b, s in zip(bulk, tail))
        return run(imgs, batch_step)

    @functools.partial(jax.jit,
                       static_argnames=('self', 'cfg', 'out_hw', 'pack'))
    def _propagate_decode(self, feats, seg_first, mask, class_valid,
                          cfg: PropagationConfig, out_hw: Tuple[int, int],
                          pack: int = 0):
        """Run propagation and decode predictions.

        Returns (seg_preds uint8 (T, *out_hw), seg_logits (T, h, w, K)).
        ``pack`` = bits per label (0 = unpacked, else 1/2/4): predictions
        are bit-packed along W — ``8 // pack`` labels per byte — cutting
        the device->host readback 8x/4x/2x. The bit width is chosen per
        video from the class count (a 2-object DAVIS video ships 2-bit
        labels), which matters because readback costs ~12 ms/frame at
        4 bits over a tunneled host link (bench.py host_link_GBps).
        Lossless; unpacked in ``_fetch_preds``."""
        seg_logits = propagate_video(feats, seg_first, mask, cfg)
        pack = 4 if pack is True else int(pack)  # legacy bool callers

        def decode(logit):
            up = resize_bilinear(logit[None], out_hw)[0]
            up = normalize_logit(up)
            up = jnp.where(class_valid, up, -1.0)  # padded classes lose
            pred = jnp.argmax(up, axis=-1).astype(jnp.uint8)
            if pack:
                per = 8 // pack
                w = pred.shape[-1]
                wp = -(-w // per) * per
                if wp > w:
                    pred = jnp.pad(pred, ((0, 0), (0, wp - w)))
                out = pred[:, 0::per]
                for i in range(1, per):
                    out = out | (pred[:, i::per] << (pack * i))
                return out
            return pred

        seg_preds = jax.lax.map(decode, seg_logits)
        return seg_preds, seg_logits

    @staticmethod
    def _fetch_preds(seg_preds, t_real: int, out_hw: Tuple[int, int],
                     packed: int) -> np.ndarray:
        """Device->host fetch (+ bit unpack when packed; ``packed`` =
        bits per label as passed to ``_propagate_decode``)."""
        arr = np.array(seg_preds[:t_real])  # writable host copy
        bits = 4 if packed is True else int(packed)
        if bits:
            per = 8 // bits
            lo = (1 << bits) - 1
            w = out_hw[1]
            out = np.empty((arr.shape[0], arr.shape[1], per * arr.shape[2]),
                           np.uint8)
            for i in range(per):
                out[..., i::per] = (arr >> (bits * i)) & lo
            arr = out[..., :w]
        return arr

    # -- orchestration ----------------------------------------------------
    def distribute(self, devices):
        """Replicate the weights onto ``devices`` for multi-chip eval.

        Videos are embarrassingly parallel at eval time (each propagates
        independently); with the weights resident per chip,
        ``preload(imgs, device=...)`` + ``forward_test`` dispatch each
        video's whole pipeline onto that chip. The TPU-native replacement
        for the reference's MMDataParallel scatter (apis/test.py:143) —
        one process drives all local chips. See
        ``single_process_test(devices=...)`` for the worker loop."""
        self._variables_by_dev = {
            d: jax.device_put(self.variables, d) for d in devices}
        return list(self._variables_by_dev)

    def _variables_for(self, arr):
        """Pick the weight copy co-located with a committed array."""
        by_dev = getattr(self, '_variables_by_dev', None)
        if by_dev:
            dev = getattr(arr, 'devices', lambda: set())()
            if dev:
                found = by_dev.get(next(iter(dev)))
                if found is not None:
                    return found
        return self.variables

    def preload(self, imgs: np.ndarray, device=None):
        """Pad T to the compile bucket and start the async host->device
        transfer. Returns an opaque handle accepted by ``forward_test`` —
        call from a prefetch thread to overlap the (slow) host link with
        the previous video's compute. ``device`` pins the video to a
        specific chip (multi-chip eval; see ``distribute``).

        ``test_cfg.input_format='yuv420'`` (uint8 RGB inputs only) packs
        frames to planar I420 before the transfer — 1.5 bytes/pixel
        instead of 3, the native sampling of video sources. The device
        reconstructs RGB inside the extraction jit (ops/yuv.py)."""
        from ...ops.yuv import Yuv420Frames, rgb_to_yuv420
        batch_step = int(self.test_cfg.get('batch_step', 20))
        t_real = imgs.shape[0]
        t_pad = _round_up(max(t_real, 2), max(batch_step, 20))
        t_pad = _round_up(t_pad, batch_step)
        yuv_geo = None
        if isinstance(imgs, Yuv420Frames):
            # pre-packed by the pipeline (RawFrameDecodeYUV420 — the
            # decoder's own planes; no host repack)
            yuv_geo = imgs.hw + (imgs.convention,)
            imgs = np.asarray(imgs)
        elif (self.test_cfg.get('input_format', 'rgb') == 'yuv420'
                and imgs.dtype == np.uint8 and imgs.ndim == 4
                and imgs.shape[-1] == 3):
            yuv_geo = tuple(imgs.shape[1:3]) + ('studio',)
            imgs = rgb_to_yuv420(imgs)
        imgs_pad = np.concatenate(
            [imgs, np.zeros((t_pad - t_real,) + imgs.shape[1:],
                            imgs.dtype)], axis=0) if t_pad > t_real else imgs
        dev_arr = jax.device_put(jnp.asarray(imgs_pad), device)
        if yuv_geo is not None:
            return ('preloaded_yuv', dev_arr, t_real, yuv_geo)
        return ('preloaded', dev_arr, t_real)

    def forward_test(self, imgs, ref_seg_map: np.ndarray,
                     img_meta: List[Dict[str, Any]],
                     defer_fetch: bool = False):
        """Propagate ``ref_seg_map`` (H0, W0 int labels) through ``imgs``
        (T, H, W, 3 normalized float RGB, or uint8 + img_norm_cfg in meta,
        or a ``preload`` handle). Returns per-feat list of (T, H0, W0)
        uint8 prediction arrays (reference forward_test,
        vanilla_tracker.py:80-206)."""
        test_cfg = self.test_cfg
        batch_step = int(test_cfg.get('batch_step', 20))
        yuv_hw = None
        if isinstance(imgs, tuple) and imgs[0] == 'preloaded_yuv':
            imgs_dev, t_real, yuv_hw = imgs[1], imgs[2], imgs[3]
        elif isinstance(imgs, tuple) and imgs[0] == 'preloaded':
            imgs_dev, t_real = imgs[1], imgs[2]
        else:
            handle = self.preload(imgs)
            if handle[0] == 'preloaded_yuv':
                _, imgs_dev, t_real, yuv_hw = handle
            else:
                _, imgs_dev, t_real = handle

        norm_mean = norm_std = None
        if imgs_dev.dtype == jnp.uint8:
            norm_cfg = img_meta[0].get('img_norm_cfg',
                                       dict(mean=np.zeros(3),
                                            std=np.ones(3)))
            norm_mean = jnp.asarray(norm_cfg['mean'], jnp.float32)
            norm_std = jnp.asarray(norm_cfg['std'], jnp.float32)
        feats = self._extract_feats(self._variables_for(imgs_dev), imgs_dev,
                                    batch_step, norm_mean, norm_std,
                                    yuv_hw=yuv_hw,
                                    bulk_step=int(test_cfg.get(
                                        'extract_bulk_step', 40)))

        original_shape = tuple(img_meta[0]['original_shape'][:2])
        input_onehot = ref_seg_map.ndim == 3  # (H, W, K) soft labels
        all_seg_preds = []
        for feat in feats:
            h, w = feat.shape[1:3]
            if not input_onehot:
                # PIL-nearest downsample of int labels -> one-hot
                # (reference vanilla_tracker.py:96-104)
                resized = pil_nearest_resize(
                    ref_seg_map.astype(np.float32), (h, w)).astype(np.int64)
                num_classes = int(ref_seg_map.max()) + 1
                k_pad = _round_up(max(num_classes, 2), 4)
                seg_first = np.zeros((h, w, k_pad), np.float32)
                onehot = np.eye(k_pad, dtype=np.float32)[resized]
                seg_first[:] = onehot
                class_valid = np.arange(k_pad) < num_classes
                first_pred = ref_seg_map.astype(np.uint8)
                if first_pred.shape != original_shape:
                    from PIL import Image
                    first_pred = np.asarray(
                        Image.fromarray(first_pred).resize(
                            (original_shape[1], original_shape[0]),
                            Image.NEAREST))
            else:
                # soft labels (JHMDB pose heatmaps): bilinear both ways
                # (reference :106-115)
                seg_first = np.asarray(resize_bilinear(
                    jnp.asarray(ref_seg_map, jnp.float32)[None],
                    (h, w))[0])
                k_pad = seg_first.shape[-1]
                class_valid = np.ones((k_pad,), bool)
                first_pred = None  # handled by caller for soft labels

            cfg, mask = make_propagation_config(test_cfg, h, w)

            # adaptive bit width: smallest of 1/2/4 bits that covers the
            # video's label range (argmax is < num_classes — padded
            # classes are masked to -1 above)
            pack = 0
            if (not input_onehot) and num_classes <= 16 \
                    and bool(test_cfg.get('pack_preds', True)):
                pack = next(b for b in (1, 2, 4)
                            if num_classes <= (1 << b))
            seg_preds, seg_logits = self._propagate_decode(
                feats=feat, seg_first=jnp.asarray(seg_first),
                mask=mask, class_valid=jnp.asarray(class_valid),
                cfg=cfg, out_hw=original_shape, pack=pack)
            if (defer_fetch and not input_onehot and not self.save_np
                    and len(feats) == 1):
                # pipelined readback: jit dispatch is async, so return
                # BEFORE the (link-bound) device->host prediction fetch;
                # the caller dispatches the next video's compute, then
                # resolves this thunk — the DMA of video i overlaps the
                # compute of video i+1 (the tunnel readback is ~40% of
                # "compute" wall on remote-device hosts, PROGRESS r3)
                seg_preds = seg_preds[:t_real]  # slice BEFORE the async
                # copy so the started DMA is the one finish() reads.
                # defer_fetch='nocopy' skips the eager DMA — used by
                # device-only benchmarks, where the background readback
                # would saturate the host link the measurement excludes
                if defer_fetch != 'nocopy':
                    try:
                        seg_preds.copy_to_host_async()
                    except Exception:
                        pass

                def finish(seg_preds=seg_preds, first_pred=first_pred):
                    sp = self._fetch_preds(seg_preds, t_real,
                                           original_shape, pack)
                    sp[0] = first_pred  # frame 0 = GT (reference :118)
                    return [sp]  # == list(all_seg_preds[0]) eager layout
                finish.seg_preds = seg_preds  # device handle (benchmarks
                # force completion with a scalar sum, no bulk readback)
                return finish
            seg_preds = self._fetch_preds(seg_preds, t_real, original_shape,
                                          pack)
            if not input_onehot:
                seg_preds[0] = first_pred  # frame 0 = GT (reference :118)
                all_seg_preds.append(seg_preds[None])  # (1, T, H0, W0)
            else:
                # soft labels: return per-frame heatmaps channel-first
                # (T, K, H0, W0) like the reference (vanilla_tracker.py:
                # 106-118,162-166 without argmax); frame 0 is the input
                # heatmap resized to the original shape.
                logits = np.array(
                    resize_bilinear(seg_logits[:t_real], original_shape))
                logits[0] = np.asarray(resize_bilinear(
                    jnp.asarray(ref_seg_map, jnp.float32)[None],
                    original_shape)[0])
                logits = np.transpose(logits, (0, 3, 1, 2))
                all_seg_preds.append(logits[None])

        if self.save_np:
            eval_dir = '.eval'
            os.makedirs(eval_dir, exist_ok=True)
            paths = []
            for seg_preds in all_seg_preds:
                tf = tempfile.NamedTemporaryFile(
                    dir=eval_dir, suffix='.npy', delete=False)
                np.save(tf.name, seg_preds[0])
                paths.append(osp.join(eval_dir, osp.basename(tf.name)))
            paths = [paths] if len(paths) > 1 else [paths[0]]
            return (lambda: paths) if defer_fetch else paths
        if len(all_seg_preds) > 1:
            out = list(np.stack(all_seg_preds, axis=1))
        else:
            out = list(all_seg_preds[0])
        # uniform caller contract: defer_fetch always returns a thunk
        # (eager here — the fast single-feat path returned earlier)
        return (lambda: out) if defer_fetch else out
