"""SiamFC tracker: init/update inference loop + linear-probe training.

Reference: projects/siamfc-pytorch/siamfc/siamfc_tracker_base.py:88-500.
TPU mapping: backbone+xcorr forward is one jitted function; the per-frame
box logic (scale penalties, hann window blend, displacement) stays host-side
numpy exactly as the reference (it is O(272^2) and parity-sensitive).
SyncBN->BN conversion (:29-47) is unnecessary: BN stats are data, the same
variables run anywhere.
"""

from __future__ import annotations

import functools
import os
import os.path as osp
import time
from typing import Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from vfs_tpu.models import build_backbone
from vfs_tpu.utils import get_root_logger

from . import ops
from .datasets import Pair, SiamFCTransforms
from .heads import SiamConvFC, SiamFC
from .losses import balanced_loss, create_labels, focal_loss

IMG_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMG_STD = np.array([58.395, 57.12, 57.375], np.float32)


class Net:
    """backbone + head as one flax-style apply (reference Net, :75-85)."""

    def __init__(self, backbone, head):
        self.backbone = backbone
        self.head = head

    def init(self, rng, z, x):
        rb, rh = jax.random.split(rng)
        bvars = self.backbone.init(rb, z, train=False)
        zf = self.backbone.apply(bvars, z, train=False)
        xf = self.backbone.apply(bvars, x, train=False)
        hvars = self.head.init(rh, zf, xf)
        return {'backbone': bvars, 'head': hvars}

    def apply(self, variables, z, x):
        zf = self.backbone.apply(variables['backbone'], z, train=False)
        xf = self.backbone.apply(variables['backbone'], x, train=False)
        return self.head.apply(variables['head'], zf, xf)


class TrackerSiamFC:

    def __init__(self, cfg, logger=None):
        self.cfg = cfg
        self.logger = logger or get_root_logger()
        backbone_cfg = dict(cfg['model']['backbone'])
        backbone_cfg.setdefault('type', 'ResNet')
        backbone_cfg.setdefault('depth', 18)
        self.backbone = build_backbone(backbone_cfg)
        if cfg['extra_conv']:
            self.head = SiamConvFC(cfg['out_channels'],
                                   cfg['out_channels'] // cfg['reduction'],
                                   out_scale=cfg['out_scale'])
        else:
            self.head = SiamFC(out_scale=cfg['out_scale'])
        self.net = Net(self.backbone, self.head)
        self.variables = None
        self.opt_state = None
        self._tx = None

    def clone(self, device=None):
        """Weight-sharing copy with independent per-sequence tracking
        state, optionally pinned to a chip — one clone per device drives
        parallel OTB sequences (the TPU-native take on the reference's
        torch.nn.DataParallel in SiamFC, siamfc_tracker_base.py:393)."""
        t = TrackerSiamFC(self.cfg, logger=self.logger)
        t.net = self.net
        t.backbone = self.backbone
        t.head = self.head
        t.variables = jax.device_put(self.variables, device) \
            if device is not None else self.variables
        return t

    # -- weights -----------------------------------------------------------
    def init_weights(self, pretrained: Optional[str] = None):
        z = jnp.zeros((1, self.cfg['exemplar_sz'], self.cfg['exemplar_sz'],
                       3), jnp.float32)
        x = jnp.zeros((1, self.cfg['instance_sz'], self.cfg['instance_sz'],
                       3), jnp.float32)
        self.variables = self.net.init(jax.random.PRNGKey(0), z, x)
        if pretrained:
            from vfs_tpu.checkpoint import load_torchvision_resnet
            params, stats = load_torchvision_resnet(pretrained)
            self.variables['backbone'] = {'params': params,
                                          'batch_stats': stats}
            self.logger.info(f'loaded backbone from {pretrained}')
        return self.variables

    # -- jitted forward pieces ----------------------------------------------
    @functools.partial(jax.jit, static_argnames=('self',))
    def _backbone_fwd(self, variables, imgs):
        # crops ship uint8 (4x less over the host link) — cast on device
        imgs = (imgs.astype(jnp.float32) - IMG_MEAN) / IMG_STD
        out = self.backbone.apply(variables['backbone'], imgs, train=False)
        return out[-1] if isinstance(out, tuple) else out

    @functools.partial(jax.jit, static_argnames=('self',))
    def _head_fwd(self, variables, zf, xf):
        return self.head.apply(variables['head'], zf, xf)

    @functools.partial(jax.jit, static_argnames=('self',))
    def _update_fwd(self, variables, kernel, x):
        """Fused search-branch forward: backbone + xcorr in ONE dispatch
        (the per-frame loop pays a fixed per-dispatch cost on remote
        devices; two calls per frame would double it)."""
        x = (x.astype(jnp.float32) - IMG_MEAN) / IMG_STD
        xf = self.backbone.apply(variables['backbone'], x, train=False)
        if isinstance(xf, tuple):
            xf = xf[-1]
        return self.head.apply(variables['head'], kernel, xf)

    @functools.partial(jax.jit, static_argnames=('self', 'bucket'))
    def _update_fwd_region(self, variables, kernel, region, taps,
                           bucket):
        """Whole update step from ONE host-shipped search region per
        sequence: in-jit scale crops (cv2-bit-replicating int32 gather
        resizes, see device_crops.device_scale_crops) + backbone + xcorr
        + response post-processing; only (scale_id, peak y, peak x) per
        sequence return to the host (VERDICT r3 #6 — the host's 3x cv2
        crop + 3x cv2 bicubic upsample per frame were the non-amortizing
        ~15 ms on a 1-core host).

        region: (K, bucket, bucket, 3) uint8; taps: (K, S, 8, out) int32
        host-built tap pack. Crops are flattened scale-major (row s*K+j)
        to pair crop (s, j) with kernel j under fast_xcorr's grouping.
        """
        from .device_crops import device_response_post, device_scale_crops
        cfg = self.cfg
        k_seq = region.shape[0]
        crops = jax.vmap(device_scale_crops)(
            region, taps)                           # (K, S, 255, 255, 3)
        x = jnp.swapaxes(crops, 0, 1).reshape(
            -1, cfg['instance_sz'], cfg['instance_sz'], 3)
        x = (x - IMG_MEAN) / IMG_STD
        xf = self.backbone.apply(variables['backbone'], x, train=False)
        if isinstance(xf, tuple):
            xf = xf[-1]
        resp = self.head.apply(variables['head'], kernel, xf)[..., 0]
        resp = resp.reshape(cfg['scale_num'], k_seq, *resp.shape[1:])
        # the host path bicubic-resizes whatever size the xcorr yields to
        # response_up * response_sz — mirror that from the traced shape
        from .device_crops import cubic_resize_matrix
        up_mat = jnp.asarray(cubic_resize_matrix(
            resp.shape[-1], cfg['response_up'] * cfg['response_sz']))
        hann = jnp.asarray(self._hann_window, jnp.float32)
        return jax.vmap(
            lambda r: device_response_post(
                r, up_mat, hann, cfg['scale_penalty'],
                cfg['window_influence']),
            in_axes=1)(resp)                        # (K,) x3

    # -- per-sequence tracking state (shared by the single-sequence
    # got10k interface and track_batch) --------------------------------------
    def _make_state(self, img, box):
        """First-frame state + exemplar crop (reference :200-243).
        ``box`` is 1-indexed ltwh. Returns (state dict, z crop)."""
        cfg = self.cfg
        box = np.array([
            box[1] - 1 + (box[3] - 1) / 2,
            box[0] - 1 + (box[2] - 1) / 2,
            box[3], box[2]], np.float32)
        st = dict(center=box[:2].copy(), target_sz=box[2:].copy())
        context = cfg['context'] * np.sum(st['target_sz'])
        st['z_sz'] = np.sqrt(np.prod(st['target_sz'] + context))
        st['x_sz'] = st['z_sz'] * cfg['instance_sz'] / cfg['exemplar_sz']
        st['avg_color'] = np.mean(img, axis=(0, 1))
        z = ops.crop_and_resize(img, st['center'], st['z_sz'],
                                out_size=cfg['exemplar_sz'],
                                border_value=st['avg_color'])
        return st, z

    @functools.cached_property
    def _scale_factors(self):
        cfg = self.cfg
        return cfg['scale_step']**np.linspace(
            -(cfg['scale_num'] // 2), cfg['scale_num'] // 2,
            cfg['scale_num'])

    @functools.cached_property
    def _hann_window(self):
        upscale_sz = self.cfg['response_up'] * self.cfg['response_sz']
        win = np.outer(np.hanning(upscale_sz), np.hanning(upscale_sz))
        return win / win.sum()

    def _make_region(self, img, st):
        """Host side of the device-crop update: one integer-corner
        region slice + per-scale offsets (no cv2 work)."""
        from .device_crops import make_region
        return make_region(img, st['center'],
                           st['x_sz'] * self._scale_factors,
                           st['avg_color'])

    def _pad_to_hwm(self, region):
        """Pad the region to the tracker's bucket high-water mark so the
        static `bucket` jit arg is monotone across frames/sequences —
        without this, x_sz drift recompiles _update_fwd_region every time
        the 64-bucket changes (measured 2.7 fps on 60-frame sequences,
        pure compile storm). The HWM is seeded with one 64-step of growth
        slack at init. Padding content is irrelevant: the sampling taps
        never leave [corner, corner+size)."""
        b = max(region.shape[0], getattr(self, '_bucket_hwm', 0))
        if b > region.shape[0]:
            pad = np.zeros((b, b, 3), region.dtype)
            pad[:region.shape[0], :region.shape[1]] = region
            region = pad
        self._bucket_hwm = b
        return region

    def _apply_peak(self, scale_id, loc, st):
        """State/box update from the device-computed (scale_id, peak):
        the tail of _apply_response after its argmax (reference
        siamfc_tracker_base.py:245-319)."""
        cfg = self.cfg
        upscale_sz = cfg['response_up'] * cfg['response_sz']
        disp_in_response = np.asarray(loc, np.float64) - \
            (upscale_sz - 1) / 2
        disp_in_instance = disp_in_response * \
            cfg['total_stride'] / cfg['response_up']
        disp_in_image = disp_in_instance * st['x_sz'] * \
            self._scale_factors[scale_id] / cfg['instance_sz']
        st['center'] += disp_in_image
        scale = (1 - cfg['scale_lr']) * 1.0 + \
            cfg['scale_lr'] * self._scale_factors[scale_id]
        st['target_sz'] *= scale
        st['z_sz'] *= scale
        st['x_sz'] *= scale
        return np.array([
            st['center'][1] + 1 - (st['target_sz'][1] - 1) / 2,
            st['center'][0] + 1 - (st['target_sz'][0] - 1) / 2,
            st['target_sz'][1], st['target_sz'][0]])

    def _scale_crops(self, img, st):
        """(S, instance_sz, instance_sz, 3) search crops for a state."""
        cfg = self.cfg
        return np.stack([
            ops.crop_and_resize(img, st['center'], st['x_sz'] * f,
                                out_size=cfg['instance_sz'],
                                border_value=st['avg_color'])
            for f in self._scale_factors])  # keeps the image dtype
        # (uint8 from read_image: 4x fewer bytes host->device)

    def _apply_response(self, responses, st):
        """Post-process raw (S, h, w) responses: bicubic x16 upsample,
        scale penalty, hann blend, displacement -> updated state + ltwh
        box (reference :245-319)."""
        cfg = self.cfg
        upscale_sz = cfg['response_up'] * cfg['response_sz']
        responses = np.stack([
            cv2.resize(u, (upscale_sz, upscale_sz),
                       interpolation=cv2.INTER_CUBIC) for u in responses])
        responses[:cfg['scale_num'] // 2] *= cfg['scale_penalty']
        responses[cfg['scale_num'] // 2 + 1:] *= cfg['scale_penalty']
        scale_id = np.argmax(np.amax(responses, axis=(1, 2)))
        response = responses[scale_id]
        response -= response.min()
        response /= response.sum() + 1e-16
        response = (1 - cfg['window_influence']) * response + \
            cfg['window_influence'] * self._hann_window
        loc = np.unravel_index(response.argmax(), response.shape)
        disp_in_response = np.array(loc) - (upscale_sz - 1) / 2
        disp_in_instance = disp_in_response * \
            cfg['total_stride'] / cfg['response_up']
        disp_in_image = disp_in_instance * st['x_sz'] * \
            self._scale_factors[scale_id] / cfg['instance_sz']
        st['center'] += disp_in_image
        scale = (1 - cfg['scale_lr']) * 1.0 + \
            cfg['scale_lr'] * self._scale_factors[scale_id]
        st['target_sz'] *= scale
        st['z_sz'] *= scale
        st['x_sz'] *= scale
        return np.array([
            st['center'][1] + 1 - (st['target_sz'][1] - 1) / 2,
            st['center'][0] + 1 - (st['target_sz'][0] - 1) / 2,
            st['target_sz'][1], st['target_sz'][0]])

    # -- got10k-compatible Tracker interface --------------------------------
    def init(self, img, box):
        """First-frame init (reference :200-243). box is 1-indexed ltwh."""
        self._state, z = self._make_state(img, box)
        self._seed_bucket_hwm([self._state])
        self.kernel = self._backbone_fwd(
            self.variables, jnp.asarray(z[None]))

    def _seed_bucket_hwm(self, states):
        from .device_crops import bucket_of
        s_max = max(float(st['x_sz']) * self._scale_factors[-1]
                    for st in states)
        seed = bucket_of(int(round(s_max))) + 64
        self._bucket_hwm = max(seed, getattr(self, '_bucket_hwm', 0))

    def update(self, img):
        """Per-frame tracking step (reference :245-319)."""
        if self.cfg.get('device_crops', True):
            from .device_crops import make_taps
            region, offs, sizes = self._make_region(img, self._state)
            region = self._pad_to_hwm(region)
            taps = make_taps(offs, sizes, self.cfg['instance_sz'])
            sid, ly, lx = self._update_fwd_region(
                self.variables, self.kernel, jnp.asarray(region[None]),
                jnp.asarray(taps[None]), bucket=region.shape[0])
            return self._apply_peak(int(sid[0]),
                                    (int(ly[0]), int(lx[0])), self._state)
        x = jnp.asarray(self._scale_crops(img, self._state))
        responses = self._update_fwd(self.variables, self.kernel, x)
        return self._apply_response(np.asarray(responses)[..., 0],
                                    self._state)

    def track(self, img_files, box, visualize=False):
        frame_num = len(img_files)
        boxes = np.zeros((frame_num, 4))
        boxes[0] = box
        times = np.zeros(frame_num)
        for f, img_file in enumerate(img_files):
            img = ops.read_image(img_file)
            begin = time.time()
            if f == 0:
                self.init(img, box)
            else:
                boxes[f, :] = self.update(img)
            times[f] = time.time() - begin
        return boxes, times

    def track_batch(self, seqs, batch_size=8):
        """Track ``seqs`` = [(img_files, first_box), ...] with K sequences
        per device dispatch, amortizing the fixed dispatch RTT (~35 ms on
        a tunneled host) K-fold — OTB runs 100 INDEPENDENT sequences, so
        batching across them is free parallelism the reference's
        sequential got10k loop leaves on the table
        (reference siamfc_tracker_base.py:245-319 drives one sequence at
        a time). Per-sequence box math is byte-identical to ``track``:
        the same host crops feed the same xcorr (``fast_xcorr`` grouping
        pairs kernel k with its own crops) and the same
        ``_apply_response``. Sequences are chunked longest-first so chunk
        members have similar lengths (stragglers waste batched compute).

        Returns [(boxes, times), ...] in the input order.
        """
        cfg = self.cfg
        s = cfg['scale_num']
        order = sorted(range(len(seqs)), key=lambda i: -len(seqs[i][0]))
        results = [None] * len(seqs)
        for c0 in range(0, len(order), batch_size):
            chunk = order[c0:c0 + batch_size]
            k = len(chunk)
            files = [seqs[i][0] for i in chunk]
            lengths = [len(f) for f in files]
            boxes = [np.zeros((n, 4)) for n in lengths]
            times = [np.zeros(n) for n in lengths]
            states, zs = [], []
            t0 = time.time()
            for j, i in enumerate(chunk):
                img = ops.read_image(files[j][0])
                st, z = self._make_state(img, seqs[i][1])
                states.append(st)
                zs.append(z)
                boxes[j][0] = seqs[i][1]
            self._seed_bucket_hwm(states)
            kernels = self._backbone_fwd(
                self.variables, jnp.asarray(np.stack(zs)))
            init_dt = (time.time() - t0) / k
            for j in range(k):
                times[j][0] = init_dt
            use_dev = cfg.get('device_crops', True)
            xs = np.zeros((s, k, cfg['instance_sz'], cfg['instance_sz'],
                           3), np.float32)
            regions = [np.zeros((64, 64, 3), np.uint8)] * k
            taps_arr = np.zeros((k, s, 8, cfg['instance_sz']), np.int32)
            for t in range(1, max(lengths)):
                begin = time.time()
                active = [j for j in range(k) if t < lengths[j]]
                if use_dev:
                    from .device_crops import make_taps
                    for j in active:
                        img = ops.read_image(files[j][t])
                        regions[j], offs_j, sizes_j = \
                            self._make_region(img, states[j])
                        taps_arr[j] = make_taps(offs_j, sizes_j,
                                                cfg['instance_sz'])
                    bucket = max(max(r.shape[0] for r in regions),
                                 self._bucket_hwm)
                    self._bucket_hwm = bucket
                    reg = np.zeros((k, bucket, bucket, 3), np.uint8)
                    for j in range(k):
                        r = regions[j]
                        reg[j, :r.shape[0], :r.shape[1]] = r
                    sid, ly, lx = self._update_fwd_region(
                        self.variables, kernels, jnp.asarray(reg),
                        jnp.asarray(taps_arr), bucket=bucket)
                    sid, ly, lx = (np.asarray(sid), np.asarray(ly),
                                   np.asarray(lx))
                    for j in active:
                        boxes[j][t] = self._apply_peak(
                            int(sid[j]), (int(ly[j]), int(lx[j])),
                            states[j])
                else:
                    for j in active:
                        img = ops.read_image(files[j][t])
                        xs[:, j] = self._scale_crops(img, states[j])
                    # scale-major flatten: row s*k+j pairs crop (s, j)
                    # with kernel j under fast_xcorr's
                    # feature_group_count=k
                    resp = np.asarray(self._update_fwd(
                        self.variables, kernels,
                        jnp.asarray(xs.reshape(s * k,
                                               *xs.shape[2:]))))[..., 0]
                    resp = resp.reshape(s, k, *resp.shape[1:])
                    for j in active:
                        boxes[j][t] = self._apply_response(resp[:, j],
                                                           states[j])
                dt = (time.time() - begin) / max(len(active), 1)
                for j in active:
                    times[j][t] = dt
            for j, i in enumerate(chunk):
                results[i] = (boxes[j], times[j])
        return results

    # -- training ------------------------------------------------------------
    def _build_optimizer(self, iters_per_epoch: int):
        import optax
        cfg = self.cfg
        wd = cfg['weight_decay'] if (
            cfg['model']['backbone'].get('frozen_stages', -1) < 4
            or cfg.get('force_wd', False)) else 0.0
        if cfg['lr_schedule'] == 'exp':
            gamma = (cfg['ultimate_lr'] / cfg['initial_lr'])**(
                1.0 / cfg['epoch_num'])
            sched = optax.exponential_decay(
                cfg['initial_lr'], transition_steps=iters_per_epoch,
                decay_rate=gamma, staircase=True)
        elif cfg['lr_schedule'] == 'step':
            sched = optax.exponential_decay(
                cfg['initial_lr'],
                transition_steps=cfg['lr_step_size'] * iters_per_epoch,
                decay_rate=0.1, staircase=True)
        else:
            sched = cfg['initial_lr']
        chain = []
        if cfg['optimizer'] == 'SGD':
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.trace(decay=cfg['momentum']))
        else:  # Adam
            chain.append(optax.scale_by_adam())
            if wd:
                chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_learning_rate(sched))
        return optax.chain(*chain), sched

    def _loss_fn(self, head_params, backbone_vars, head_extra, z, x, labels):
        variables = {'backbone': backbone_vars,
                     'head': {**head_extra, 'params': head_params}}
        responses = self.net.apply(variables, z, x)[..., 0]
        if self.cfg['loss'] == 'focal':
            return focal_loss(responses, labels)
        return balanced_loss(responses, labels)

    def train_over(self, seqs, work_dir='./work_dirs/siamfc'):
        """Linear-probe training on sequence pairs (reference :388-467).
        Only head params train when frozen_stages=4 (the linear probe)."""
        import optax

        from vfs_tpu.datasets.builder import DataLoader
        cfg = self.cfg
        transforms = SiamFCTransforms(
            exemplar_sz=cfg['exemplar_sz'], instance_sz=cfg['instance_sz'],
            context=cfg['context'])
        dataset = Pair(seqs=seqs, transforms=transforms,
                       pairs_per_seq=cfg.get('pairs_per_seq', 1))
        loader = DataLoader(dataset, batch_size=cfg['batch_size'],
                            shuffle=True, num_workers=cfg['num_workers'],
                            drop_last=True)
        tx, sched = self._build_optimizer(len(loader))
        head_params = self.variables['head']['params']
        head_extra = {k: v for k, v in self.variables['head'].items()
                      if k != 'params'}
        opt_state = tx.init(head_params)

        grad_fn = jax.jit(jax.value_and_grad(
            lambda hp, z, x, labels: self._loss_fn(
                hp, self.variables['backbone'], head_extra, z, x, labels)))

        @jax.jit
        def apply_updates(hp, opt_state, grads):
            updates, opt_state = tx.update(grads, opt_state, hp)
            return optax.apply_updates(hp, updates), opt_state

        step = 0
        labels_cache = {}
        os.makedirs(work_dir, exist_ok=True)
        for epoch in range(cfg['epoch_num']):
            loader.set_epoch(epoch)
            for i, batch in enumerate(loader):
                z = jnp.asarray((batch['z'] - IMG_MEAN) / IMG_STD)
                x = jnp.asarray((batch['x'] - IMG_MEAN) / IMG_STD)
                # label size from the response size (static per shapes)
                key = (z.shape, x.shape)
                if key not in labels_cache:
                    zf = self._backbone_fwd(self.variables, z[:1])
                    xf = self._backbone_fwd(self.variables, x[:1])
                    r = self._head_fwd(self.variables, zf, xf)
                    labels_cache[key] = jnp.asarray(np.tile(create_labels(
                        r.shape[1:3], cfg['r_pos'], cfg['r_neg'],
                        cfg['total_stride'])[None], (z.shape[0], 1, 1)))
                labels = labels_cache[key]
                # z/x already normalized; _loss_fn normalizes again inside
                # _backbone_fwd? no — net.apply uses raw backbone; keep
                # normalized inputs here.
                loss, grads = grad_fn(head_params, z, x, labels)
                head_params, opt_state = apply_updates(head_params,
                                                       opt_state, grads)
                step += 1
                if (i + 1) % cfg.get('log_interval', 20) == 0:
                    self.logger.info(
                        f'Epoch {epoch + 1} [{i + 1}/{len(loader)}] '
                        f'loss: {float(loss):.4f}')
            self.variables['head'] = {**head_extra, 'params': head_params}
            from vfs_tpu.checkpoint import save_checkpoint
            save_checkpoint(osp.join(work_dir, 'checkpoints'), epoch + 1,
                            jax.device_get(self.variables))
        self.variables['head'] = {**head_extra, 'params': head_params}
        return self.variables
