"""Config sanity: every shipped config builds its model and pipelines
(reference test pattern: tests/test_config.py:26-77 — the reference's
version globbed non-existent dirs and was vacuous; this one actually
builds)."""

import glob
import os.path as osp

import pytest

from vfs_tpu.datasets.pipelines.compose import Compose
from vfs_tpu.models import build_model
from vfs_tpu.utils import Config

CONFIG_DIR = osp.join(osp.dirname(__file__), '..', 'configs')
CONFIGS = sorted(glob.glob(osp.join(CONFIG_DIR, '*.py')))


@pytest.mark.parametrize('config_path', CONFIGS)
def test_config_builds(config_path):
    cfg = Config.fromfile(config_path)
    model = build_model(cfg.model, train_cfg=cfg.get('train_cfg'),
                        test_cfg=cfg.get('test_cfg'))
    assert model is not None
    # pipelines compose
    Compose(cfg.data.train.dataset.pipeline
            if 'dataset' in cfg.data.train else cfg.data.train.pipeline)
    Compose(cfg.data.val.pipeline)
    Compose(cfg.data.test.pipeline)
    # eval tracker rebuild (tools/test.py path)
    tracker = build_model(
        dict(type='VanillaTracker', backbone=dict(cfg.model.backbone)),
        test_cfg=cfg.test_cfg)
    assert tracker.stride == 8  # eval output stride (1,2,1,1) -> 8


def test_all_four_configs_present():
    names = {osp.basename(p) for p in CONFIGS}
    assert names == {
        'r18_nc_sgd_cos_100e_r2_1xNx8_k400.py',
        'r18_sgd_cos_100e_r2_1xNx8_k400.py',
        'r50_nc_sgd_cos_100e_r5_1xNx2_k400.py',
        'r50_sgd_cos_100e_r5_1xNx2_k400.py',
    }
