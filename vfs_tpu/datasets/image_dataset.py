"""Static-image dataset treated as 1-frame videos (reference:
mmaction/datasets/image_dataset.py:11-57 — torchvision-style folder scan)."""

from __future__ import annotations

import os
import os.path as osp

from .registry import DATASETS
from .video_dataset import VideoDataset

IMG_EXTENSIONS = ('.jpg', '.jpeg', '.png', '.bmp', '.webp')


@DATASETS.register_module()
class ImageDataset(VideoDataset):
    """ann_file lines ``image_path label``, or a class-per-subdir folder
    scan when ann_file is a directory."""

    def __init__(self, ann_file, pipeline, **kwargs):
        if osp.isdir(ann_file):
            self._scan_root = ann_file
        else:
            self._scan_root = None
        super().__init__(ann_file, pipeline, start_index=0, **kwargs)

    def load_annotations(self):
        if self._scan_root is None:
            return super().load_annotations()
        classes = sorted(
            d for d in os.listdir(self._scan_root)
            if osp.isdir(osp.join(self._scan_root, d)))
        video_infos = []
        for label, cls in enumerate(classes):
            cls_dir = osp.join(self._scan_root, cls)
            for fname in sorted(os.listdir(cls_dir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    video_infos.append(
                        dict(filename=osp.join(cls_dir, fname),
                             label=label))
        return video_infos
