"""Load the UNMODIFIED upstream reference modules (/root/reference, the
PyTorch VFS implementation) for differential parity testing, supplying a
minimal mmcv shim for the handful of symbols the hot-path files import.

The shim implements only glue (ConvModule = Conv2d+BN+ReLU in mmcv's
default conv->norm->act order, checkpoint loading via torch.load, inits);
all semantics under test come from the reference's own .py files, executed
as-is. If the reference tree is absent the loader raises ImportError and
dependent tests skip.
"""

import importlib.util
import logging
import os
import sys
import types

REF_ROOT = '/root/reference'


def _build_mmcv_stub():
    import cv2
    import numpy as np
    import torch
    import torch.nn as nn
    from torch.nn.modules.batchnorm import _BatchNorm

    mmcv = types.ModuleType('mmcv')
    mmcv_cnn = types.ModuleType('mmcv.cnn')
    mmcv_runner = types.ModuleType('mmcv.runner')
    mmcv_utils = types.ModuleType('mmcv.utils')

    class ConvModule(nn.Module):
        """conv -> norm -> act, bias='auto' => no bias when normed
        (mmcv.cnn.ConvModule default behavior, order ('conv','norm','act')).
        conv_cfg type 'Conv3d'/'BN3d' dispatches to the 3D layers."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias='auto',
                     conv_cfg=None, norm_cfg=None, act_cfg='default',
                     **kwargs):
            super().__init__()
            self.with_norm = norm_cfg is not None
            if bias == 'auto':
                bias = not self.with_norm
            self.in_channels = in_channels
            self.out_channels = out_channels
            conv_type = (conv_cfg or {}).get('type', 'Conv2d') \
                if isinstance(conv_cfg, dict) else 'Conv2d'
            is3d = conv_type != 'Conv2d' and conv_type != 'Conv'
            if conv_type in ('Conv', 'Conv2d', 'Conv3d'):
                conv_cls = nn.Conv3d if is3d else nn.Conv2d
                self.conv = conv_cls(in_channels, out_channels,
                                     kernel_size, stride, padding,
                                     dilation, groups, bias=bias)
            else:
                # custom registered conv layer (e.g. the reference's
                # Conv2plus1d) — resolved from the CONV_LAYERS stub
                conv_cls = CONV_LAYERS._registry[conv_type]
                self.conv = conv_cls(in_channels, out_channels,
                                     kernel_size, stride=stride,
                                     padding=padding, bias=bias)
            if self.with_norm:
                # BN/SyncBN behave as plain BatchNorm single-process
                self.bn = (nn.BatchNorm3d if is3d
                           else nn.BatchNorm2d)(out_channels)
            if act_cfg == 'default':
                act_cfg = dict(type='ReLU')
            self.with_act = act_cfg is not None
            if self.with_act:
                assert act_cfg.get('type', 'ReLU') == 'ReLU', act_cfg
                self.activate = nn.ReLU(inplace=True)

        @property
        def norm(self):
            return self.bn

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.bn(x)
            if self.with_act:
                x = self.activate(x)
            return x

    def kaiming_init(module, a=0, mode='fan_out', nonlinearity='relu',
                     bias=0, distribution='normal'):
        if distribution == 'normal':
            nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                    nonlinearity=nonlinearity)
        else:
            nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                     nonlinearity=nonlinearity)
        if getattr(module, 'bias', None) is not None:
            nn.init.constant_(module.bias, bias)

    def constant_init(module, val, bias=0):
        if getattr(module, 'weight', None) is not None:
            nn.init.constant_(module.weight, val)
        if getattr(module, 'bias', None) is not None:
            nn.init.constant_(module.bias, bias)

    def _load_checkpoint(filename, map_location='cpu'):
        return torch.load(filename, map_location=map_location,
                          weights_only=False)

    def load_checkpoint(model, filename, strict=False, logger=None,
                        map_location='cpu'):
        sd = _load_checkpoint(filename, map_location)
        if 'state_dict' in sd:
            sd = sd['state_dict']
        model.load_state_dict(sd, strict=strict)
        return sd

    def imresize(img, size, interpolation='bilinear', backend=None):
        if backend == 'pillow':
            from PIL import Image
            modes = {'nearest': Image.NEAREST, 'bilinear': Image.BILINEAR,
                     'bicubic': Image.BICUBIC}
            pil = Image.fromarray(img)
            return np.array(pil.resize(size, modes[interpolation]))
        inters = {'nearest': cv2.INTER_NEAREST,
                  'bilinear': cv2.INTER_LINEAR,
                  'bicubic': cv2.INTER_CUBIC}
        return cv2.resize(img, size, interpolation=inters[interpolation])

    class _ConvLayers:
        _registry = {}

        def register_module(self, *a, **k):
            def deco(cls):
                self._registry[cls.__name__] = cls
                return cls
            return deco

    CONV_LAYERS = _ConvLayers()
    mmcv_cnn.CONV_LAYERS = CONV_LAYERS

    def build_norm_layer(cfg, num_features):
        t = cfg['type']
        if t in ('BN3d',):
            return 'bn', nn.BatchNorm3d(num_features)
        if t in ('BN', 'BN2d', 'SyncBN'):
            return 'bn', nn.BatchNorm2d(num_features)
        raise ValueError(t)

    mmcv_cnn.build_norm_layer = build_norm_layer
    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.build_activation_layer = lambda cfg: nn.ReLU(
        inplace=cfg.get('inplace', True)) if cfg else nn.Identity()

    class NonLocal3d(nn.Module):
        """Faithful reimplementation of mmcv.cnn.NonLocal3d (the external
        dependency the reference wires into ResNet3d blocks and TSM's
        NL3DWrapper): g/theta/phi 1x1x1 convs to in_channels//reduction,
        pairwise modes gaussian / embedded_gaussian (default, scaled
        softmax) / dot_product (mean) / concatenation, optional
        sub_sample max-pool (1,2,2) on keys/values, conv_out with
        optional norm and mmcv's zeros_init identity start."""

        def __init__(self, in_channels, reduction=2, use_scale=True,
                     conv_cfg=None, norm_cfg=None,
                     mode='embedded_gaussian', sub_sample=False, **kwargs):
            super().__init__()
            self.in_channels = in_channels
            self.inter_channels = max(in_channels // reduction, 1)
            self.use_scale = use_scale
            self.mode = mode
            self.sub_sample = sub_sample
            self.with_norm = norm_cfg is not None
            i = self.inter_channels
            self.g = nn.Conv3d(in_channels, i, 1)
            self.conv_out = nn.Conv3d(i, in_channels, 1,
                                      bias=not self.with_norm)
            if self.with_norm:
                self.norm = nn.BatchNorm3d(in_channels)
            if mode != 'gaussian':
                self.theta = nn.Conv3d(in_channels, i, 1)
                self.phi = nn.Conv3d(in_channels, i, 1)
            if mode == 'concatenation':
                self.concat_project = nn.Sequential(
                    nn.Conv2d(i * 2, 1, 1, bias=False), nn.ReLU())
            self.pool = nn.MaxPool3d(kernel_size=(1, 2, 2))
            # mmcv init: normal(0.01) on g/theta/phi, identity start on
            # the output path (norm weight zero, or conv weight zero)
            for m in [self.g] + ([self.theta, self.phi]
                                 if mode != 'gaussian' else []):
                nn.init.normal_(m.weight, std=0.01)
                nn.init.zeros_(m.bias)
            if self.with_norm:
                nn.init.zeros_(self.norm.weight)
                nn.init.zeros_(self.norm.bias)
            else:
                nn.init.zeros_(self.conv_out.weight)
                nn.init.zeros_(self.conv_out.bias)

        def forward(self, x):
            n = x.size(0)
            g_x = self.g(x)
            if self.sub_sample:
                g_x = self.pool(g_x)
            g_x = g_x.view(n, self.inter_channels, -1).permute(0, 2, 1)
            if self.mode == 'gaussian':
                theta_x = x.view(n, self.in_channels, -1).permute(0, 2, 1)
                phi_x = self.pool(x) if self.sub_sample else x
                phi_x = phi_x.reshape(n, self.in_channels, -1)
                pw = torch.matmul(theta_x, phi_x).softmax(dim=-1)
            elif self.mode == 'concatenation':
                theta_x = self.theta(x).view(n, self.inter_channels, -1, 1)
                phi_x = self.phi(x)
                if self.sub_sample:
                    phi_x = self.pool(phi_x)
                phi_x = phi_x.reshape(n, self.inter_channels, 1, -1)
                h_, w_ = theta_x.size(2), phi_x.size(3)
                cat = torch.cat([theta_x.repeat(1, 1, 1, w_),
                                 phi_x.repeat(1, 1, h_, 1)], dim=1)
                pw = self.concat_project(cat).view(n, h_, w_) / w_
            else:
                theta_x = self.theta(x).view(
                    n, self.inter_channels, -1).permute(0, 2, 1)
                phi_x = self.phi(x)
                if self.sub_sample:
                    phi_x = self.pool(phi_x)
                phi_x = phi_x.reshape(n, self.inter_channels, -1)
                pw = torch.matmul(theta_x, phi_x)
                if self.mode == 'embedded_gaussian':
                    if self.use_scale:
                        pw = pw / theta_x.shape[-1]**0.5
                    pw = pw.softmax(dim=-1)
                else:
                    pw = pw / pw.shape[-1]
            y = torch.matmul(pw, g_x).permute(0, 2, 1).contiguous().reshape(
                n, self.inter_channels, *x.size()[2:])
            out = self.conv_out(y)
            if self.with_norm:
                out = self.norm(out)
            return x + out

    mmcv_cnn.NonLocal3d = NonLocal3d
    mmcv_cnn.kaiming_init = kaiming_init
    mmcv_cnn.constant_init = constant_init
    mmcv_cnn.normal_init = lambda m, mean=0, std=1, bias=0: None
    mmcv_runner._load_checkpoint = _load_checkpoint
    mmcv_runner.load_checkpoint = load_checkpoint
    mmcv_utils._BatchNorm = _BatchNorm
    mmcv.imresize = imresize

    # small mmcv helpers the reference pipeline transforms use
    def is_tuple_of(seq, expected_type):
        return isinstance(seq, tuple) and all(
            isinstance(s, expected_type) for s in seq)

    def rescale_size(old_size, scale, return_scale=False):
        w, h = old_size
        if isinstance(scale, (float, int)):
            scale_factor = scale
        else:
            max_long, max_short = max(scale), min(scale)
            scale_factor = min(max_long / max(h, w),
                               max_short / min(h, w))
        new_size = (int(w * scale_factor + 0.5),
                    int(h * scale_factor + 0.5))
        return (new_size, scale_factor) if return_scale else new_size

    def imnormalize_(img, mean, std, to_rgb=True):
        assert img.dtype != np.uint8
        mean = np.float64(mean.reshape(1, -1))
        stdinv = 1 / np.float64(std.reshape(1, -1))
        if to_rgb:
            cv2.cvtColor(img, cv2.COLOR_BGR2RGB, img)
        cv2.subtract(img, mean, img)
        cv2.multiply(img, stdinv, img)
        return img

    def imflip_(img, direction='horizontal'):
        return cv2.flip(img, 1 if direction == 'horizontal' else 0, img)

    mmcv.imflip_ = imflip_
    mmcv.is_tuple_of = is_tuple_of
    mmcv.rescale_size = rescale_size
    mmcv.imnormalize_ = imnormalize_
    mmcv.rgb2gray = lambda img, keepdim=False: (
        cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None] if keepdim
        else cv2.cvtColor(img, cv2.COLOR_RGB2GRAY))
    mmcv.cnn = mmcv_cnn
    mmcv.runner = mmcv_runner
    mmcv.utils = mmcv_utils
    return {'mmcv': mmcv, 'mmcv.cnn': mmcv_cnn, 'mmcv.runner': mmcv_runner,
            'mmcv.utils': mmcv_utils}


def _exec_ref_module(fullname, relpath):
    path = os.path.join(REF_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


_cache = {}


def load_reference():
    """Returns a namespace with the reference hot-path modules:
    ``.common_utils``, ``.local_attention``, ``.affinity_utils``,
    ``.resnet`` — all executed verbatim from /root/reference.
    """
    if 'ns' in _cache:
        return _cache['ns']
    if not os.path.isdir(REF_ROOT):
        raise ImportError(f'reference tree not found at {REF_ROOT}')

    stubs = _build_mmcv_stub()
    saved = {k: sys.modules.get(k) for k in list(stubs) + [
        'refmm', 'refmm.utils', 'refmm.models', 'refmm.models.registry',
        'refmm.models.common', 'refmm.models.common.utils',
        'refmm.models.common.local_attention',
        'refmm.models.common.affinity_utils',
        'refmm.models.backbones', 'refmm.models.backbones.resnet']}
    sys.modules.update(stubs)

    # synthetic package skeleton so the reference's relative imports
    # (from ...utils import get_root_logger / from ..registry import
    # BACKBONES / from ..common import change_stride) resolve
    refmm = types.ModuleType('refmm')
    refmm.__path__ = []
    ref_utils = types.ModuleType('refmm.utils')
    ref_utils.get_root_logger = lambda *a, **k: logging.getLogger('refmm')
    models = types.ModuleType('refmm.models')
    models.__path__ = []
    registry = types.ModuleType('refmm.models.registry')

    class _Registry:
        def register_module(self, *a, **k):
            return lambda cls: cls

    registry.BACKBONES = _Registry()
    registry.TRACKERS = _Registry()
    common_pkg = types.ModuleType('refmm.models.common')
    common_pkg.__path__ = []
    backbones_pkg = types.ModuleType('refmm.models.backbones')
    backbones_pkg.__path__ = []
    sys.modules.update({
        'refmm': refmm, 'refmm.utils': ref_utils, 'refmm.models': models,
        'refmm.models.registry': registry,
        'refmm.models.common': common_pkg,
        'refmm.models.backbones': backbones_pkg,
    })

    common_utils = _exec_ref_module('refmm.models.common.utils',
                                    'mmaction/models/common/utils.py')
    # `from ..common import change_stride` resolves against the package
    # module, so mirror the real package __init__ exports we need
    for name in ('change_stride', 'pil_nearest_interpolate', 'video2images',
                 'images2video', 'cat', 'StrideContext'):
        if hasattr(common_utils, name):
            setattr(common_pkg, name, getattr(common_utils, name))
    local_attention = _exec_ref_module(
        'refmm.models.common.local_attention',
        'mmaction/models/common/local_attention.py')
    affinity_utils = _exec_ref_module(
        'refmm.models.common.affinity_utils',
        'mmaction/models/common/affinity_utils.py')
    resnet = _exec_ref_module('refmm.models.backbones.resnet',
                              'mmaction/models/backbones/resnet.py')

    ns = types.SimpleNamespace(
        common_utils=common_utils, local_attention=local_attention,
        affinity_utils=affinity_utils, resnet=resnet,
        ConvModule=stubs['mmcv.cnn'].ConvModule)
    _cache['ns'] = ns
    # leave the synthetic modules installed (they are uniquely named except
    # mmcv, which isn't otherwise importable in this env)
    for k, v in saved.items():
        if v is not None:
            sys.modules[k] = v
    return ns


def load_reference_siamfc():
    """Execute the reference SiamFC pixel-protocol modules
    (projects/siamfc-pytorch/siamfc/{bbox_utils,image_utils,ops}.py)
    verbatim; returns a namespace with ``.ops``."""
    if 'siamfc' in _cache:
        return _cache['siamfc']
    root = os.path.join(REF_ROOT, 'projects/siamfc-pytorch/siamfc')
    if not os.path.isdir(root):
        raise ImportError(f'reference siamfc not found at {root}')
    pkg = types.ModuleType('refsiam')
    pkg.__path__ = [root]
    sys.modules['refsiam'] = pkg
    for name in ('bbox_utils', 'image_utils', 'ops'):
        mod = _exec_ref_module(
            f'refsiam.{name}',
            f'projects/siamfc-pytorch/siamfc/{name}.py')
        setattr(pkg, name, mod)
    ns = types.SimpleNamespace(ops=sys.modules['refsiam.ops'])
    _cache['siamfc'] = ns
    return ns


def load_reference_bmn():
    """Execute the reference BMN localizer + temporal-IoU utilities
    (mmaction/models/localizers/bmn.py, localization/proposal_utils.py)
    verbatim, with builder/registry stubbed (generate_labels and the
    interp1d sampling mask need only numpy + the constructed module)."""
    import torch.nn as nn
    if 'bmn' in _cache:
        return _cache['bmn']
    proposal_utils = _exec_ref_module('refmm.localization.proposal_utils',
                                      'mmaction/localization/proposal_utils.py')
    loc_pkg = types.ModuleType('refmm.localization')
    loc_pkg.__path__ = []
    loc_pkg.temporal_iou = proposal_utils.temporal_iou
    loc_pkg.temporal_iop = proposal_utils.temporal_iop
    loc_pkg.soft_nms = getattr(proposal_utils, 'soft_nms', None)
    builder_mod = types.ModuleType('refmm.models.builder')
    builder_mod.build_loss = lambda cfg: nn.Identity()

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    registry_mod = sys.modules.get('refmm.models.registry')
    if registry_mod is None:
        registry_mod = types.ModuleType('refmm.models.registry')
        sys.modules['refmm.models.registry'] = registry_mod
    registry_mod.LOCALIZERS = _Reg()
    base_mod = types.ModuleType('refmm.models.localizers.base')

    class BaseLocalizer(nn.Module):
        pass

    base_mod.BaseLocalizer = BaseLocalizer
    utils_mod = types.ModuleType('refmm.models.localizers.utils')
    utils_mod.post_processing = lambda *a, **k: None
    sys.modules.update({
        'refmm.localization': loc_pkg,
        'refmm.models.builder': builder_mod,
        'refmm.models.localizers.base': base_mod,
        'refmm.models.localizers.utils': utils_mod,
    })
    bmn = _exec_ref_module('refmm.models.localizers.bmn',
                           'mmaction/models/localizers/bmn.py')
    bsn = _exec_ref_module('refmm.models.localizers.bsn',
                           'mmaction/models/localizers/bsn.py')
    ns = types.SimpleNamespace(BMN=bmn.BMN, TEM=bsn.TEM, PEM=bsn.PEM,
                               proposal_utils=proposal_utils)
    _cache['bmn'] = ns
    return ns


def load_reference_pipelines():
    """Execute the reference data-pipeline modules verbatim
    (mmaction/datasets/pipelines/{loading,augmentations}.py), stubbing
    the import-time externals this env lacks (mmcv.fileio, skimage,
    torchvision). Returns a namespace with ``.loading`` and
    ``.augmentations``."""
    import numpy as np
    if 'pipelines' in _cache:
        return _cache['pipelines']
    if 'mmcv' not in sys.modules:
        sys.modules.update(_build_mmcv_stub())
    mmcv_fileio = types.ModuleType('mmcv.fileio')

    class FileClient:
        def __init__(self, *a, **k):
            pass

        def get(self, filepath):
            with open(filepath, 'rb') as f:
                return f.read()

    mmcv_fileio.FileClient = FileClient
    sys.modules['mmcv.fileio'] = mmcv_fileio
    sys.modules['mmcv'].fileio = mmcv_fileio

    skimage = types.ModuleType('skimage')
    skimage_util = types.ModuleType('skimage.util')

    def view_as_windows(*a, **k):
        raise NotImplementedError('skimage stub (unused in parity tests)')

    skimage_util.view_as_windows = view_as_windows
    skimage.util = skimage_util
    tv = types.ModuleType('torchvision')
    tv_t = types.ModuleType('torchvision.transforms')
    tv_f = types.ModuleType('torchvision.transforms.functional')
    for name in ('ColorJitter', 'RandomAffine', 'RandomResizedCrop'):
        setattr(tv_t, name, type(name, (), {}))
    tv_t.functional = tv_f
    tv.transforms = tv_t
    sys.modules.update({'skimage': skimage, 'skimage.util': skimage_util,
                        'torchvision': tv, 'torchvision.transforms': tv_t,
                        'torchvision.transforms.functional': tv_f})

    if 'refmm' not in sys.modules:  # skeleton when load_reference not run
        refmm = types.ModuleType('refmm')
        refmm.__path__ = []
        sys.modules['refmm'] = refmm
    utils_mod = sys.modules.get('refmm.utils')
    if utils_mod is None:
        utils_mod = types.ModuleType('refmm.utils')
        sys.modules['refmm.utils'] = utils_mod
    utils_mod.get_random_string = lambda length=15: 'x' * length
    utils_mod.get_shm_dir = lambda: '/tmp'
    utils_mod.get_thread_id = lambda: 0
    ds_pkg = types.ModuleType('refmm.datasets')
    ds_pkg.__path__ = []
    pipe_pkg = types.ModuleType('refmm.datasets.pipelines')
    pipe_pkg.__path__ = []
    registry_mod = types.ModuleType('refmm.datasets.registry')

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    registry_mod.PIPELINES = _Reg()
    sys.modules.update({'refmm.datasets': ds_pkg,
                        'refmm.datasets.pipelines': pipe_pkg,
                        'refmm.datasets.registry': registry_mod})
    # the reference predates numpy 1.24 (np.int / np.float aliases)
    if not hasattr(np, 'int'):
        np.int = int
    if not hasattr(np, 'float'):
        np.float = float
    loading = _exec_ref_module('refmm.datasets.pipelines.loading',
                               'mmaction/datasets/pipelines/loading.py')
    augmentations = _exec_ref_module(
        'refmm.datasets.pipelines.augmentations',
        'mmaction/datasets/pipelines/augmentations.py')
    ns = types.SimpleNamespace(loading=loading, augmentations=augmentations)
    _cache['pipelines'] = ns
    return ns


def load_reference_simsiam():
    """Execute the reference SimSiam head + CosineSimLoss verbatim
    (mmaction/models/heads/sim_siam_head.py, losses/sim_loss.py) —
    the VFS pretraining objective."""
    import torch.nn as nn
    if 'simsiam' in _cache:
        return _cache['simsiam']
    if 'mmcv' not in sys.modules:
        sys.modules.update(_build_mmcv_stub())
    mmcv_cnn = sys.modules['mmcv.cnn']

    def build_norm_layer(cfg, num_features):
        t = cfg['type']
        if t in ('BN', 'SyncBN'):
            return 'bn', nn.BatchNorm2d(num_features)
        raise ValueError(t)

    mmcv_cnn.build_norm_layer = getattr(mmcv_cnn, 'build_norm_layer',
                                        build_norm_layer)
    mmcv_cnn.build_plugin_layer = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError('plugin layers unused'))

    if 'refmm' not in sys.modules:
        refmm = types.ModuleType('refmm')
        refmm.__path__ = []
        sys.modules['refmm'] = refmm
    models_pkg = sys.modules.get('refmm.models')
    if models_pkg is None:
        models_pkg = types.ModuleType('refmm.models')
        models_pkg.__path__ = []
        sys.modules['refmm.models'] = models_pkg
    registry_mod = sys.modules.get('refmm.models.registry')
    if registry_mod is None:
        registry_mod = types.ModuleType('refmm.models.registry')
        sys.modules['refmm.models.registry'] = registry_mod

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    for name in ('LOSSES', 'HEADS'):
        if not hasattr(registry_mod, name):
            setattr(registry_mod, name, _Reg())
    losses_pkg = types.ModuleType('refmm.models.losses')
    losses_pkg.__path__ = []
    sys.modules['refmm.models.losses'] = losses_pkg
    _exec_ref_module('refmm.models.losses.base',
                     'mmaction/models/losses/base.py')
    sim_loss = _exec_ref_module('refmm.models.losses.sim_loss',
                                'mmaction/models/losses/sim_loss.py')

    builder_mod = sys.modules.get('refmm.models.builder')
    if builder_mod is None:
        builder_mod = types.ModuleType('refmm.models.builder')
        sys.modules['refmm.models.builder'] = builder_mod

    def build_loss(cfg):
        cfg = dict(cfg)
        t = cfg.pop('type')
        if hasattr(sim_loss, t):
            return getattr(sim_loss, t)(**cfg)
        if t == 'CrossEntropyLoss':  # the recognition heads' default
            return nn.CrossEntropyLoss()
        raise AttributeError(t)

    builder_mod.build_loss = build_loss
    builder_mod.build_drop_layer = lambda cfg: nn.Identity()
    heads_pkg = types.ModuleType('refmm.models.heads')
    heads_pkg.__path__ = []
    sys.modules['refmm.models.heads'] = heads_pkg
    head_mod = _exec_ref_module('refmm.models.heads.sim_siam_head',
                                'mmaction/models/heads/sim_siam_head.py')
    ns = types.SimpleNamespace(SimSiamHead=head_mod.SimSiamHead,
                               CosineSimLoss=sim_loss.CosineSimLoss)
    _cache['simsiam'] = ns
    return ns


def load_reference_siamfc_tracker():
    """Execute the reference TrackerSiamFC verbatim (projects/
    siamfc-pytorch/siamfc/siamfc_tracker_base.py): the full OTB tracking
    protocol — exemplar/search crops, xcorr response, bicubic upsample,
    scale penalties, hann window, box update. got10k/mmaction/mmcv
    externals are stubbed; the VFS ResNet backbone is the reference's
    own (load_reference().resnet)."""
    import torch
    if 'siamfc_tracker' in _cache:
        return _cache['siamfc_tracker']
    ref = load_reference()               # provides the reference ResNet
    load_reference_siamfc()              # refsiam.{ops,bbox,image}
    load_reference_pipelines()           # installs the torchvision stub

    # functional torchvision.Normalize (the pipelines stub's empty class
    # would break the tracker's crop preprocessing)
    tv_t = sys.modules['torchvision.transforms']

    class _TVNormalize:
        def __init__(self, mean, std):
            self.mean = mean
            self.std = std

        def __call__(self, t):
            m = torch.tensor(self.mean).view(-1, 1, 1).to(t)
            s = torch.tensor(self.std).view(-1, 1, 1).to(t)
            return (t - m) / s

    tv_t.Normalize = _TVNormalize

    got10k = types.ModuleType('got10k')
    got10k_trackers = types.ModuleType('got10k.trackers')

    class Tracker:
        def __init__(self, name, is_deterministic=False):
            self.name = name
            self.is_deterministic = is_deterministic

    got10k_trackers.Tracker = Tracker
    got10k.trackers = got10k_trackers
    sys.modules.update({'got10k': got10k,
                        'got10k.trackers': got10k_trackers})

    mmcv_parallel = types.ModuleType('mmcv.parallel')
    mmcv_parallel.is_module_wrapper = lambda m: False
    sys.modules['mmcv.parallel'] = mmcv_parallel
    sys.modules['mmcv'].parallel = mmcv_parallel
    runner = sys.modules['mmcv.runner']
    if not hasattr(runner, 'save_checkpoint'):
        runner.save_checkpoint = lambda *a, **k: None

    mmaction = types.ModuleType('mmaction')
    mmaction_models = types.ModuleType('mmaction.models')
    mmaction_models.ResNet = ref.resnet.ResNet

    def build_backbone(cfg):
        cfg = dict(cfg)
        cfg.pop('type', None)
        return ref.resnet.ResNet(**cfg)

    mmaction_models.build_backbone = build_backbone
    mmaction_utils = types.ModuleType('mmaction.utils')
    mmaction_utils.terminal_is_available = lambda: False
    mmaction.models = mmaction_models
    mmaction.utils = mmaction_utils
    sys.modules.update({'mmaction': mmaction,
                        'mmaction.models': mmaction_models,
                        'mmaction.utils': mmaction_utils})
    # mmcv.Config for the attr-style cfg the tracker expects
    mmcv_mod = sys.modules['mmcv']
    if not hasattr(mmcv_mod, 'Config'):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        from vfs_tpu.utils import Config as _Cfg
        mmcv_mod.Config = _Cfg

    for name in ('backbones', 'datasets', 'heads', 'losses', 'transforms',
                 'siamfc_tracker_base'):
        mod = _exec_ref_module(
            f'refsiam.{name}',
            f'projects/siamfc-pytorch/siamfc/{name}.py')
        setattr(sys.modules['refsiam'], name, mod)
    tb = sys.modules['refsiam.siamfc_tracker_base']
    ns = types.SimpleNamespace(TrackerSiamFC=tb.TrackerSiamFC,
                               heads=sys.modules['refsiam.heads'])
    _cache['siamfc_tracker'] = ns
    return ns


def load_reference_tracker():
    """Execute the reference VanillaTracker verbatim (mmaction/models/
    trackers/{base,vanilla_tracker}.py) — the complete DAVIS label-
    propagation protocol on top of the already-loaded reference ResNet,
    masked attention, and spatial_neighbor."""
    if 'tracker' in _cache:
        return _cache['tracker']
    ref = load_reference()
    common_pkg = sys.modules['refmm.models.common']
    for mod, names in ((ref.local_attention,
                        ('masked_attention_efficient',)),
                       (ref.affinity_utils, ('spatial_neighbor',))):
        for n in names:
            setattr(common_pkg, n, getattr(mod, n))
    runner = sys.modules['mmcv.runner']
    if not hasattr(runner, 'auto_fp16'):
        runner.auto_fp16 = lambda *a, **k: (lambda f: f)
    builder_mod = sys.modules.get('refmm.models.builder')
    if builder_mod is None:
        builder_mod = types.ModuleType('refmm.models.builder')
        sys.modules['refmm.models.builder'] = builder_mod

    def build_backbone(cfg):
        cfg = dict(cfg)
        cfg.pop('type', None)
        return ref.resnet.ResNet(**cfg)

    builder_mod.build_backbone = build_backbone
    models_pkg = sys.modules['refmm.models']
    models_pkg.builder = builder_mod
    registry_mod = sys.modules['refmm.models.registry']

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    if not hasattr(registry_mod, 'TRACKERS'):
        registry_mod.TRACKERS = _Reg()
    trackers_pkg = types.ModuleType('refmm.models.trackers')
    trackers_pkg.__path__ = []
    sys.modules['refmm.models.trackers'] = trackers_pkg
    # backbones package already holds the exec'd resnet; vanilla_tracker
    # does `from ..backbones import ResNet`
    sys.modules['refmm.models.backbones'].ResNet = ref.resnet.ResNet
    _exec_ref_module('refmm.models.trackers.base',
                     'mmaction/models/trackers/base.py')
    vt = _exec_ref_module('refmm.models.trackers.vanilla_tracker',
                          'mmaction/models/trackers/vanilla_tracker.py')
    ns = types.SimpleNamespace(VanillaTracker=vt.VanillaTracker)
    _cache['tracker'] = ns
    return ns


def load_reference_simsiam_tracker():
    """Execute the reference SimSiamBaseTracker verbatim
    (mmaction/models/trackers/sim_siam_base_tracker.py) — the complete
    pretraining step: two-view backbone forward, projection/prediction
    head, stop-grad symmetric loss, intra-video temporal rolls."""
    if 'simsiam_tracker' in _cache:
        return _cache['simsiam_tracker']
    load_reference_tracker()             # base + vanilla + builder
    simsiam = load_reference_simsiam()   # SimSiamHead + CosineSimLoss
    builder_mod = sys.modules['refmm.models.builder']

    def build_head(cfg):
        cfg = dict(cfg)
        cfg.pop('type', None)
        return simsiam.SimSiamHead(**cfg)

    builder_mod.build_head = build_head
    # sim_siam_base_tracker imports mmaction.utils.add_prefix absolutely
    mmaction = sys.modules.get('mmaction')
    if mmaction is None:
        mmaction = types.ModuleType('mmaction')
        sys.modules['mmaction'] = mmaction
    utils_mod = getattr(mmaction, 'utils', None)
    if utils_mod is None:
        utils_mod = types.ModuleType('mmaction.utils')
        mmaction.utils = utils_mod
        sys.modules['mmaction.utils'] = utils_mod

    def add_prefix(inputs, prefix):
        return {f'{prefix}.{k}': v for k, v in inputs.items()}

    utils_mod.add_prefix = add_prefix
    st = _exec_ref_module('refmm.models.trackers.sim_siam_base_tracker',
                          'mmaction/models/trackers/sim_siam_base_tracker.py')
    ns = types.SimpleNamespace(SimSiamBaseTracker=st.SimSiamBaseTracker)
    _cache['simsiam_tracker'] = ns
    return ns


def load_reference_resnet3d():
    """Execute the reference ResNet3d verbatim
    (mmaction/models/backbones/resnet3d.py)."""
    if 'resnet3d' in _cache:
        return _cache['resnet3d']
    load_reference()  # installs mmcv stub + refmm skeleton
    r3d = _exec_ref_module('refmm.models.backbones.resnet3d',
                           'mmaction/models/backbones/resnet3d.py')
    ns = types.SimpleNamespace(ResNet3d=r3d.ResNet3d)
    _cache['resnet3d'] = ns
    return ns


def load_reference_resnet_tsm():
    """Execute the reference ResNetTSM verbatim
    (mmaction/models/backbones/resnet_tsm.py)."""
    if 'resnet_tsm' in _cache:
        return _cache['resnet_tsm']
    load_reference()
    tsm = _exec_ref_module('refmm.models.backbones.resnet_tsm',
                           'mmaction/models/backbones/resnet_tsm.py')
    ns = types.SimpleNamespace(ResNetTSM=tsm.ResNetTSM,
                               TemporalShift=getattr(tsm, 'TemporalShift',
                                                     None))
    _cache['resnet_tsm'] = ns
    return ns


def load_reference_slowfast():
    """Execute the reference ResNet3dSlowFast verbatim
    (mmaction/models/backbones/resnet3d_slowfast.py)."""
    if 'slowfast' in _cache:
        return _cache['slowfast']
    load_reference_resnet3d()
    sys.modules['mmcv.utils'].print_log = lambda *a, **k: None
    sf = _exec_ref_module('refmm.models.backbones.resnet3d_slowfast',
                          'mmaction/models/backbones/resnet3d_slowfast.py')
    ns = types.SimpleNamespace(ResNet3dSlowFast=sf.ResNet3dSlowFast)
    _cache['slowfast'] = ns
    return ns


def load_reference_3d_variants():
    """Execute the remaining reference 3D variants verbatim: SlowOnly
    (pathway subclass), CSN, and R(2+1)D (+ its Conv2plus1d layer)."""
    if 'variants3d' in _cache:
        return _cache['variants3d']
    load_reference_slowfast()  # resnet3d + pathway
    _exec_ref_module('refmm.models.common.conv2plus1d',
                     'mmaction/models/common/conv2plus1d.py')
    so = _exec_ref_module('refmm.models.backbones.resnet3d_slowonly',
                          'mmaction/models/backbones/resnet3d_slowonly.py')
    csn = _exec_ref_module('refmm.models.backbones.resnet3d_csn',
                           'mmaction/models/backbones/resnet3d_csn.py')
    r21d = _exec_ref_module('refmm.models.backbones.resnet2plus1d',
                            'mmaction/models/backbones/resnet2plus1d.py')
    ns = types.SimpleNamespace(ResNet3dSlowOnly=so.ResNet3dSlowOnly,
                               ResNet3dCSN=csn.ResNet3dCSN,
                               ResNet2Plus1d=r21d.ResNet2Plus1d)
    _cache['variants3d'] = ns
    return ns


def load_reference_heads():
    """Execute the reference recognition heads verbatim
    (mmaction/models/heads/{base,tsn,i3d,tsm,slowfast}_head.py)."""
    if 'heads' in _cache:
        return _cache['heads']
    load_reference()
    builder_mod = sys.modules.get('refmm.models.builder')
    if builder_mod is None:
        builder_mod = types.ModuleType('refmm.models.builder')
        sys.modules['refmm.models.builder'] = builder_mod
    if not hasattr(builder_mod, 'build_loss'):
        import torch.nn as nn
        builder_mod.build_loss = lambda cfg: nn.CrossEntropyLoss()
    registry_mod = sys.modules['refmm.models.registry']

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    if not hasattr(registry_mod, 'HEADS'):
        registry_mod.HEADS = _Reg()
    core_mod = types.ModuleType('refmm.core')
    core_acc = _exec_ref_module('refmm.core.accuracy',
                                'mmaction/core/evaluation/accuracy.py')
    core_mod.top_k_accuracy = core_acc.top_k_accuracy
    sys.modules['refmm.core'] = core_mod
    heads_pkg = sys.modules.get('refmm.models.heads')
    if heads_pkg is None:
        heads_pkg = types.ModuleType('refmm.models.heads')
        heads_pkg.__path__ = []
        sys.modules['refmm.models.heads'] = heads_pkg
    base = _exec_ref_module('refmm.models.heads.base',
                            'mmaction/models/heads/base.py')
    heads_pkg.AvgConsensus = base.AvgConsensus
    heads_pkg.BaseHead = base.BaseHead
    sys.modules['refmm.models.heads.base'] = base
    mods = {}
    for name in ('tsn_head', 'i3d_head', 'tsm_head', 'slowfast_head'):
        mods[name] = _exec_ref_module(f'refmm.models.heads.{name}',
                                      f'mmaction/models/heads/{name}.py')
    ns = types.SimpleNamespace(
        TSNHead=mods['tsn_head'].TSNHead,
        I3DHead=mods['i3d_head'].I3DHead,
        TSMHead=mods['tsm_head'].TSMHead,
        SlowFastHead=mods['slowfast_head'].SlowFastHead)
    _cache['heads'] = ns
    return ns


def load_reference_tin():
    """Execute the reference ResNetTIN verbatim
    (mmaction/models/backbones/resnet_tin.py). mmcv.ops.tin_shift is a
    CUDA extension; the stub implements its documented semantics
    (output[t] = input[t - shift] per channel group, zero-padded) — the
    same convention vfs_tpu uses, so the parity test validates the
    offset/weight nets and the interlace composition around it."""
    import torch
    if 'tin' in _cache:
        return _cache['tin']
    load_reference_resnet_tsm()
    mmcv_ops = types.ModuleType('mmcv.ops')

    def tin_shift(data, shift):
        n, t, c, hw = data.shape
        groups = shift.shape[1]
        gsize = c // groups
        out = torch.zeros_like(data)
        for b in range(n):
            for g in range(groups):
                s = int(shift[b, g])
                cs = slice(g * gsize, (g + 1) * gsize)
                lo, hi = max(0, s), min(t, t + s)
                if lo < hi:
                    out[b, lo:hi, cs] = data[b, lo - s:hi - s, cs]
        return out

    mmcv_ops.tin_shift = tin_shift
    sys.modules['mmcv.ops'] = mmcv_ops
    sys.modules['mmcv'].ops = mmcv_ops
    tin = _exec_ref_module('refmm.models.backbones.resnet_tin',
                           'mmaction/models/backbones/resnet_tin.py')
    ns = types.SimpleNamespace(ResNetTIN=tin.ResNetTIN,
                               linear_sampler=tin.linear_sampler,
                               TemporalInterlace=tin.TemporalInterlace)
    _cache['tin'] = ns
    return ns


def load_reference_ssn_head():
    """Execute the reference SSNHead + STPP consensus verbatim
    (mmaction/models/heads/ssn_head.py)."""
    if 'ssn_head' in _cache:
        return _cache['ssn_head']
    load_reference()
    registry_mod = sys.modules.get('refmm.models.registry')
    if registry_mod is None:
        registry_mod = types.ModuleType('refmm.models.registry')
        sys.modules['refmm.models.registry'] = registry_mod

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    if not hasattr(registry_mod, 'HEADS'):
        registry_mod.HEADS = _Reg()
    if 'refmm.models.heads' not in sys.modules:
        heads_pkg = types.ModuleType('refmm.models.heads')
        heads_pkg.__path__ = []
        sys.modules['refmm.models.heads'] = heads_pkg
    mod = _exec_ref_module('refmm.models.heads.ssn_head',
                           'mmaction/models/heads/ssn_head.py')
    ns = types.SimpleNamespace(SSNHead=mod.SSNHead,
                               STPPTrain=mod.STPPTrain)
    _cache['ssn_head'] = ns
    return ns


def load_reference_ssn_loss():
    """Execute the reference SSNLoss + OHEMHingeLoss verbatim
    (mmaction/models/losses/{ssn_loss,ohem_hinge_loss}.py)."""
    if 'ssn_loss' in _cache:
        return _cache['ssn_loss']
    load_reference()
    registry_mod = sys.modules.get('refmm.models.registry')
    if registry_mod is None:
        registry_mod = types.ModuleType('refmm.models.registry')
        sys.modules['refmm.models.registry'] = registry_mod

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    if not hasattr(registry_mod, 'LOSSES'):
        registry_mod.LOSSES = _Reg()
    if 'refmm.models.losses' not in sys.modules:
        pkg = types.ModuleType('refmm.models.losses')
        pkg.__path__ = []
        sys.modules['refmm.models.losses'] = pkg
    _exec_ref_module('refmm.models.losses.ohem_hinge_loss',
                     'mmaction/models/losses/ohem_hinge_loss.py')
    mod = _exec_ref_module('refmm.models.losses.ssn_loss',
                           'mmaction/models/losses/ssn_loss.py')
    ns = types.SimpleNamespace(SSNLoss=mod.SSNLoss)
    _cache['ssn_loss'] = ns
    return ns


def load_reference_tin_lr():
    """Execute the reference TINLrUpdaterHook verbatim
    (mmaction/core/lr/tin_lr_hook.py:1-45). The mmcv LrUpdaterHook base
    driver (before_run/before_train_epoch/before_train_iter dispatch and
    annealing_cos) is stubbed to mmcv v1.x semantics; the warmup ramp and
    shifted-cosine get_lr under test are the reference's own code."""
    import math

    if 'tin_lr' in _cache:
        return _cache['tin_lr']
    if 'mmcv' not in sys.modules:
        sys.modules.update(_build_mmcv_stub())

    def annealing_cos(start, end, factor, weight=1):
        cos_out = math.cos(math.pi * factor) + 1
        return end + 0.5 * weight * (start - end) * cos_out

    class LrUpdaterHook:
        def __init__(self, by_epoch=True, warmup=None, warmup_iters=0,
                     warmup_ratio=0.1, warmup_by_epoch=False):
            self.by_epoch = by_epoch
            self.warmup = warmup
            self.warmup_iters = warmup_iters
            self.warmup_ratio = warmup_ratio
            self.warmup_by_epoch = warmup_by_epoch
            self.base_lr = []
            self.regular_lr = []

        def _set_lr(self, runner, lr_groups):
            for group, lr in zip(runner.optimizer.param_groups, lr_groups):
                group['lr'] = lr

        def get_lr(self, runner, base_lr):
            raise NotImplementedError

        def get_regular_lr(self, runner):
            return [self.get_lr(runner, b) for b in self.base_lr]

        def before_run(self, runner):
            for group in runner.optimizer.param_groups:
                group.setdefault('initial_lr', group['lr'])
            self.base_lr = [g['initial_lr']
                            for g in runner.optimizer.param_groups]

        def before_train_epoch(self, runner):
            if not self.by_epoch:
                return
            self.regular_lr = self.get_regular_lr(runner)
            self._set_lr(runner, self.regular_lr)

        def before_train_iter(self, runner):
            cur_iter = runner.iter
            if not self.by_epoch:
                self.regular_lr = self.get_regular_lr(runner)
                if self.warmup is None or cur_iter >= self.warmup_iters:
                    self._set_lr(runner, self.regular_lr)
                else:
                    self._set_lr(runner, self.get_warmup_lr(cur_iter))
            else:
                if self.warmup is None or cur_iter > self.warmup_iters:
                    return
                elif cur_iter == self.warmup_iters:
                    self._set_lr(runner, self.regular_lr)
                else:
                    self._set_lr(runner, self.get_warmup_lr(cur_iter))

    runner_mod = sys.modules['mmcv.runner']
    runner_mod.LrUpdaterHook = LrUpdaterHook
    if not hasattr(runner_mod, 'HOOKS'):
        class _Reg:
            def register_module(self, *a, **k):
                return lambda cls: cls
        runner_mod.HOOKS = _Reg()
    hooks_pkg = types.ModuleType('mmcv.runner.hooks')
    lr_updater = types.ModuleType('mmcv.runner.hooks.lr_updater')
    lr_updater.annealing_cos = annealing_cos
    hooks_pkg.lr_updater = lr_updater
    runner_mod.hooks = hooks_pkg
    sys.modules.update({'mmcv.runner.hooks': hooks_pkg,
                        'mmcv.runner.hooks.lr_updater': lr_updater})
    mod = _exec_ref_module('refmm.core.lr.tin_lr_hook',
                           'mmaction/core/lr/tin_lr_hook.py')
    ns = types.SimpleNamespace(TINLrUpdaterHook=mod.TINLrUpdaterHook,
                               LrUpdaterHook=LrUpdaterHook)
    _cache['tin_lr'] = ns
    return ns
