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
        'r18_sgd_cos_100e_r2_1xNx8_k400_deviceaug.py',
    }


def test_deviceaug_config_chain_builds():
    """The device-aug variant's cfg.device_aug spec must compile into a
    runnable on-device chain with the config's own norm constants."""
    import jax
    import numpy as np

    from vfs_tpu.ops.device_aug import build_device_aug
    cfg = Config.fromfile(osp.join(
        CONFIG_DIR, 'r18_sgd_cos_100e_r2_1xNx8_k400_deviceaug.py'))
    fn = build_device_aug(cfg.device_aug['transforms'], cfg.img_norm_cfg,
                          out_hw=tuple(cfg.device_aug['out_hw']))
    imgs = np.zeros((1, 2, 4, 64, 80, 3), np.uint8)
    out = fn(imgs, np.asarray([[256, 340]]), jax.random.PRNGKey(0))
    assert out.shape == (1, 2, 4, 224, 224, 3)


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


def test_reference_component_registry_parity():
    """Every @register_module class in the reference's models/ and
    datasets/ packages must resolve in one of our registries — the
    component-inventory guarantee, parsed from the reference tree when
    present so the list can't drift."""
    import re
    import subprocess

    import vfs_tpu.datasets  # noqa: F401  (registers datasets+pipelines)
    import vfs_tpu.models  # noqa: F401  (registers model components)
    from vfs_tpu.datasets.registry import DATASETS, PIPELINES
    from vfs_tpu.models.registry import (BACKBONES, HEADS, LOCALIZERS,
                                         LOSSES, RECOGNIZERS, TRACKERS)

    ref_root = '/root/reference/mmaction'
    names = set()
    if osp.isdir(ref_root):
        for sub in ('models', 'datasets'):
            out = subprocess.run(
                ['grep', '-rA2', 'register_module',
                 osp.join(ref_root, sub), '--include=*.py'],
                capture_output=True, text=True).stdout
            names |= set(re.findall(r'class (\w+)', out))
    else:  # frozen snapshot of the reference's registered classes
        names = {
            'ActivityNetDataset', 'AlexNetV1', 'AlexNetV2', 'AlexNetV3',
            'AppendFrames', 'BCELossWithLogits', 'BMN', 'BMNLoss',
            'BinaryLogisticRegressionLoss', 'CenterCrop', 'Clip2Frame',
            'Collect', 'ColorJitter', 'Conv2plus1d', 'CosineSimLoss',
            'CrossEntropyLoss', 'DavisDataset', 'DecordDecode',
            'DecordInit', 'DenseSampleFrames', 'DenseSimSiamHead',
            'DotSimLoss', 'DuplicateFrames', 'Flip', 'FormatShape',
            'Frame2Clip', 'FrameSelector', 'Fuse',
            'GenerateLocalizationLabels', 'Grid', 'HidePatch', 'I3DHead',
            'Image2Patch', 'ImageDataset', 'ImageToTensor',
            'JHMDBDataset', 'L1Loss', 'LoadLocalizationFeature',
            'LoadProposals', 'MSELoss', 'MultiGroupCrop',
            'MultiScaleCrop', 'NLLLoss', 'Normalize', 'OpenCVDecode',
            'OpenCVInit', 'PEM', 'PhotoMetricDistortion', 'PyAVDecode',
            'PyAVInit', 'RGB2LAB', 'RandomAffine', 'RandomChoiceRotate',
            'RandomCrop', 'RandomErasing', 'RandomGaussianBlur',
            'RandomGrayScale', 'RandomResizedCrop', 'RawFrameDecode',
            'RawImageDecode', 'RawframeDataset', 'Recognizer2D',
            'Recognizer3D', 'RepeatDataset', 'ResNet', 'ResNet2Plus1d',
            'ResNet3d', 'ResNet3dCSN', 'ResNet3dSlowFast',
            'ResNet3dSlowOnly', 'ResNetTIN', 'ResNetTSM', 'Resize', 'SSN',
            'SSNDataset', 'SSNHead', 'SSNLoss', 'SampleFrames',
            'SampleProposalFrames', 'SequentialSampleFrames',
            'SimSiamBaseTracker', 'SimSiamHead', 'SlowFastHead',
            'SmoothL1Loss', 'TEM', 'TSMHead', 'TSNHead', 'TenCrop',
            'ThreeCrop', 'ToDataContainer', 'ToTensor', 'Transpose',
            'UntrimmedSampleFrames', 'VIPDataset', 'VanillaTracker',
            'VideoDataset',
        }
    names -= {'for', 'Compose'}  # grep artifact / explicit class
    # Conv2plus1d is a conv-layer PLUGIN in the reference (registered into
    # mmcv's CONV_LAYERS so conv_cfg=dict(type=...) can select it); here
    # there is no conv_cfg plugin system — R(2+1)D uses the flax module
    # resnet3d_variants.Conv2Plus1d directly (documented in docs/config.md)
    names -= {'Conv2plus1d'}

    registries = (PIPELINES, DATASETS, BACKBONES, HEADS, LOSSES,
                  RECOGNIZERS, LOCALIZERS, TRACKERS)
    missing = [n for n in sorted(names)
               if all(r.get(n) is None for r in registries)]
    assert not missing, f'unregistered reference components: {missing}'
