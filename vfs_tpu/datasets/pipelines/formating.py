"""Output formatting (reference: mmaction/datasets/pipelines/formating.py).

TPU layout note: the reference's ``FormatShape('NCTHW')`` produces
(N_clips, C, T, H, W) torch tensors; this framework is channels-last, so the
same config key produces ``(N_clips, T, H, W, C)`` numpy arrays — the clip
structure is identical, only the channel axis position differs (documented
here so configs stay source-compatible)."""

from __future__ import annotations

import numpy as np

from ..registry import PIPELINES


@PIPELINES.register_module()
class FormatShape:
    """Reshape the flat (M, H, W, C) frame stack into clips."""

    def __init__(self, input_format):
        if input_format not in ('NCTHW', 'NTHWC', 'NCHW', 'NHWC'):
            raise ValueError(f'input_format {input_format} invalid')
        self.input_format = input_format

    def __call__(self, results):
        imgs = results['imgs']
        if isinstance(imgs, list):
            imgs = np.stack(imgs)
        num_clips = results['num_clips']
        clip_len = results['clip_len']
        if self.input_format in ('NCTHW', 'NTHWC'):
            # (M, H, W, C) -> (num_clips, clip_len, H, W, C)
            imgs = imgs.reshape((num_clips, clip_len) + imgs.shape[1:])
        else:
            # frame-level: (M, H, W, C) stays
            pass
        results['imgs'] = imgs
        results['input_shape'] = imgs.shape
        return results


@PIPELINES.register_module()
class Collect:
    """Collect ``keys`` plus an ``img_meta`` dict of ``meta_keys``
    (reference formating.py:145-218; no DataContainer — plain dicts)."""

    def __init__(self, keys, meta_keys=('frame_dir', 'frame_inds',
                                        'original_shape', 'seg_map')):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        data = {}
        if len(self.meta_keys) != 0:
            meta = {k: results[k] for k in self.meta_keys if k in results}
            # always carry normalization params so models can normalize
            # uint8 frames on device (Normalize(on_device=True))
            if 'img_norm_cfg' in results:
                meta.setdefault('img_norm_cfg', results['img_norm_cfg'])
            data['img_meta'] = meta
        for key in self.keys:
            data[key] = results[key]
        return data


@PIPELINES.register_module()
class ToTensor:
    """No-op numpy passthrough kept for config compatibility (arrays go to
    device inside the jitted step, not per-sample)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for key in self.keys:
            results[key] = np.asarray(results[key])
        return results


@PIPELINES.register_module()
class Transpose:

    def __init__(self, keys, order):
        self.keys = keys
        self.order = order

    def __call__(self, results):
        for key in self.keys:
            results[key] = np.transpose(results[key], self.order)
        return results


@PIPELINES.register_module()
class ImageToTensor:
    """Materialize image keys as arrays (reference formating.py:89-112
    transposes HWC->CHW for torch; this framework is channels-last
    end-to-end, so the layout stays HWC — documented in the module
    docstring alongside FormatShape)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for key in self.keys:
            results[key] = np.ascontiguousarray(results[key])
        return results


@PIPELINES.register_module()
class ToDataContainer:
    """Config-compatibility no-op (reference formating.py:59-88 wraps
    fields in mmcv DataContainer for its collate; this framework collates
    plain numpy dicts, so fields pass through unchanged)."""

    def __init__(self, fields=None):
        self.fields = fields

    def __call__(self, results):
        return results
