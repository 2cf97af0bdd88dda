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


def test_get_flops_runs():
    r = _run(['tools/analysis/get_flops.py',
              'configs/r18_nc_sgd_cos_100e_r2_1xNx8_k400.py',
              '--shape', '64', '64'], timeout=600)
    assert r.returncode == 0, r.stderr
    assert 'flops' in r.stdout.lower() or 'FLOPs' in r.stdout
