"""Native FFmpeg video decode path (VERDICT.md missing#3): DecordInit /
DecordDecode now carry true decord semantics — container probe, keyframe
seek, unique-index decode map — via vfs_tpu/native/video_decoder.cpp,
with pixel parity against the cv2 sequential decoder and a K400-style
VideoDataset training batch flowing through the new path.
"""

import os
import os.path as osp

import numpy as np
import pytest

from vfs_tpu.datasets import build_dataloader, build_dataset
from vfs_tpu.datasets.native_loader import (decode_video_indices,
                                            get_video_lib, probe_video)
from vfs_tpu.datasets.pipelines import Compose

pytestmark = pytest.mark.skipif(get_video_lib() is None,
                                reason='native video decoder unavailable')


@pytest.fixture(scope='module')
def index_video(tmp_path_factory):
    """60-frame mp4 whose frame i is solid gray i*4 — decode correctness
    is then readable off the pixel values."""
    import cv2
    path = str(tmp_path_factory.mktemp('vid') / 'idx.mp4')
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 30, (64, 48))
    for i in range(60):
        w.write(np.full((48, 64, 3), i * 4, np.uint8))
    w.release()
    return path


def test_probe(index_video):
    num_frames, h, w, fps = probe_video(index_video)
    assert (num_frames, h, w) == (60, 48, 64)
    assert fps == pytest.approx(30.0)


def test_decode_indices_exact_and_order_preserving(index_video):
    idx = [59, 0, 7, 7, 33]  # unordered with a repeat
    out = decode_video_indices(index_video, idx)
    assert out.shape == (5, 48, 64, 3)
    for want, frame in zip(idx, out):
        got = int(np.median(frame))
        assert abs(got - want * 4) <= 4, (want, got)  # codec quantization
    np.testing.assert_array_equal(out[2], out[3])  # repeated index


def test_decode_matches_cv2(index_video):
    import cv2
    idx = [0, 7, 33, 59]
    ours = decode_video_indices(index_video, idx)
    cap = cv2.VideoCapture(index_video)
    i, frames = 0, {}
    while True:
        ok, f = cap.read()
        if not ok:
            break
        if i in idx:
            frames[i] = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
        i += 1
    cap.release()
    for j, w in enumerate(idx):
        np.testing.assert_array_equal(ours[j], frames[w])


def test_decode_resize(index_video):
    out = decode_video_indices(index_video, [5], out_hw=(24, 32))
    assert out.shape == (1, 24, 32, 3)
    assert abs(int(np.median(out[0])) - 20) <= 4


def test_oob_index_clamps_to_last_frame(index_video):
    """A past-EOF index must clamp to the TRUE last decoded frame (59),
    not to the last in-range wanted index (decord parity)."""
    out = decode_video_indices(index_video, [10, 200])
    assert abs(int(np.median(out[0])) - 40) <= 4    # frame 10
    assert abs(int(np.median(out[1])) - 236) <= 6   # frame 59, not 10


def test_all_indices_past_eof_clamp(index_video):
    """Every wanted index beyond the true last frame (duration*fps
    metadata overcount on VFR video): decord clamps to the last frame
    instead of erroring, and so must we."""
    out = decode_video_indices(index_video, [200, 300])
    assert out is not None, 'all-past-EOF clip must clamp, not fail'
    assert out.shape == (2, 48, 64, 3)
    np.testing.assert_array_equal(out[0], out[1])
    # pixels must come from a real late frame, not garbage
    assert int(np.median(out[0])) > 200  # frame 59 is gray 236


def test_decord_pipeline_classes(index_video):
    pipe = Compose([
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=2, frame_interval=1,
             num_clips=2, test_mode=True),
        dict(type='DecordDecode'),
    ])
    results = pipe(dict(filename=index_video, start_index=0))
    assert results['total_frames'] == 60
    assert len(results['imgs']) == 4
    assert results['original_shape'] == (48, 64)
    # frames must correspond to the sampled indices
    for ind, img in zip(results['frame_inds'], results['imgs']):
        assert abs(int(np.median(img)) - int(ind) * 4) <= 4


def test_videodataset_k400_style_batch(tmp_path, index_video):
    """K400-style .mp4 training batch through the native decoder: the
    exact r50 pretrain pipeline shape (2 clips x 1 frame)."""
    ann = tmp_path / 'list.txt'
    ann.write_text(f'{index_video} 0\n{index_video} 1\n')
    dataset = build_dataset(dict(
        type='VideoDataset', ann_file=str(ann), data_prefix=None,
        pipeline=[
            dict(type='DecordInit'),
            dict(type='SampleFrames', clip_len=1, frame_interval=1,
                 num_clips=2),
            dict(type='DecordDecode'),
            dict(type='RandomResizedCrop', area_range=(0.5, 1.0)),
            dict(type='Resize', scale=(32, 32), keep_ratio=False),
            dict(type='Flip', flip_ratio=0.5),
            dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375]),
            dict(type='FormatShape', input_format='NCTHW'),
            dict(type='Collect', keys=['imgs', 'label'], meta_keys=()),
        ]))
    loader = build_dataloader(dataset, videos_per_gpu=2, workers_per_gpu=0,
                              shuffle=False, drop_last=False, seed=0)
    batch = next(iter(loader))
    assert batch['imgs'].shape == (2, 2, 1, 32, 32, 3)
    assert batch['imgs'].dtype == np.float32
    assert list(batch['label']) == [0, 1]
