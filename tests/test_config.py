"""Config sanity: every shipped config builds its model and pipelines
(reference test pattern: tests/test_config.py:26-77 — the reference's
version globbed non-existent dirs and was vacuous; this one actually
builds)."""

import glob
import os.path as osp

import numpy as np

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


def test_reference_pipeline_registry_parity():
    """Every transform name the reference's pipeline package exports must
    resolve in our PIPELINES registry (VERDICT.md next#9) — parsed from
    the reference tree when present so the list can't drift."""
    import re

    import vfs_tpu.datasets.pipelines  # noqa: F401  (registers)
    from vfs_tpu.datasets.registry import PIPELINES

    ref_init = '/root/reference/mmaction/datasets/pipelines/__init__.py'
    if osp.isfile(ref_init):
        with open(ref_init) as f:
            names = sorted(set(re.findall(r"'(\w+)'", f.read())))
    else:  # frozen snapshot of the reference exports
        names = [
            'AppendFrames', 'CenterCrop', 'Clip2Frame', 'Collect',
            'ColorJitter', 'Compose', 'DecordDecode', 'DecordInit',
            'DenseSampleFrames', 'DuplicateFrames', 'Flip', 'FormatShape',
            'Frame2Clip', 'FrameSelector', 'Fuse',
            'GenerateLocalizationLabels', 'Grid', 'HidePatch',
            'Image2Patch', 'ImageToTensor', 'LoadLocalizationFeature',
            'LoadProposals', 'MultiGroupCrop', 'MultiScaleCrop',
            'Normalize', 'OpenCVDecode', 'OpenCVInit',
            'PhotoMetricDistortion', 'PyAVDecode', 'PyAVInit', 'RGB2LAB',
            'RandomAffine', 'RandomChoiceRotate', 'RandomCrop',
            'RandomErasing', 'RandomGaussianBlur', 'RandomGrayScale',
            'RandomResizedCrop', 'RawFrameDecode', 'RawImageDecode',
            'Resize', 'SampleFrames', 'SampleProposalFrames',
            'SequentialSampleFrames', 'TenCrop', 'ThreeCrop',
            'ToDataContainer', 'ToTensor', 'Transpose',
            'UntrimmedSampleFrames']
    missing = [n for n in names
               if n != 'Compose' and PIPELINES.get(n) is None]
    assert not missing, f'unregistered reference transforms: {missing}'


def test_multigroupcrop_and_imagetotensor():
    from vfs_tpu.datasets.pipelines import Compose
    imgs = [np.full((8, 10, 3), i, np.uint8) for i in range(3)]
    pipe = Compose([dict(type='MultiGroupCrop', crop_size=4, groups=2)])
    out = pipe(dict(imgs=[i.copy() for i in imgs], img_shape=(8, 10)))
    assert len(out['imgs']) == 6  # 2 groups x 3 frames
    assert out['imgs'][0].shape == (4, 4, 3)
    assert out['crop_bbox'].shape == (6, 4)
    # frames within a group share the bbox; values preserved per frame
    assert int(out['imgs'][1][0, 0, 0]) == 1
    pipe2 = Compose([dict(type='ImageToTensor', keys=['img']),
                     dict(type='ToDataContainer'),
                     dict(type='Fuse')])
    r = pipe2(dict(img=np.ones((5, 6, 3), np.float32)))
    assert r['img'].shape == (5, 6, 3)
