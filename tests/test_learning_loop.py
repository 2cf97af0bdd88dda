"""Learning-loop plumbing: the full pretrain->convert->eval circle of
tools/learning_loop.py runs end-to-end at tiny scale (the margin
demonstration itself — J&F(pretrained) > J&F(random) — is the tool's
job at real scale; its measured numbers live in PROGRESS.md).

Covers: synthetic-world generation determinism, RawframeDataset training
through the GSPMD step, orbax -> torchvision .pth conversion, loading
that .pth into a stride-switched VanillaTracker, DAVIS-protocol J&F on
the synthetic val split, and the GT correspondence-retrieval metric.
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))


def test_learning_loop_plumbing(tmp_path):
    from learning_loop import (build_tracker, eval_jf, eval_retrieval,
                               make_synthetic_world, pretrain)

    data_root = str(tmp_path / 'data')
    train_ann, val_ann, img_root, ann_root = make_synthetic_world(
        data_root, n_train=8, n_val=2, train_frames=8, val_frames=6,
        seed=0)
    # deterministic in seed: regenerating gives identical bytes
    with open(osp.join(img_root, 'val000', '00000.jpg'), 'rb') as f:
        first = f.read()
    make_synthetic_world(data_root, n_train=8, n_val=2, train_frames=8,
                         val_frames=6, seed=0)
    with open(osp.join(img_root, 'val000', '00000.jpg'), 'rb') as f:
        assert f.read() == first

    pth = pretrain(str(tmp_path / 'work'), train_ann, total_epochs=1,
                   repeat=1, batch=8, seed=0)
    assert osp.isfile(pth)
    import torch
    sd = torch.load(pth, map_location='cpu', weights_only=True)
    assert 'conv1.weight' in sd and 'layer4.1.bn2.running_var' in sd

    model = build_tracker(pth)
    jf = eval_jf(model, data_root, val_ann, img_root, ann_root)
    retr = eval_retrieval(model, img_root, ann_root)
    assert np.isfinite(jf) and 0.0 <= jf <= 1.0
    assert 0.0 <= retr <= 1.0
