"""Native C++ frame loader: build, decode parity vs cv2, resize path,
failure fallback."""

import os.path as osp

import numpy as np
import pytest

from vfs_tpu.datasets.native_loader import decode_jpeg_batch, get_lib


@pytest.fixture(scope='module')
def jpegs(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp('jpegs')
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        p = str(d / f'{i:05d}.jpg')
        cv2.imwrite(p, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_native_decode_parity(jpegs):
    if get_lib() is None:
        pytest.skip('native toolchain unavailable')
    import cv2
    batch = decode_jpeg_batch(jpegs, num_threads=2)
    assert batch.shape == (4, 48, 64, 3)
    for i, p in enumerate(jpegs):
        ref = cv2.cvtColor(cv2.imread(p, cv2.IMREAD_COLOR),
                           cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(batch[i], ref)


def test_native_decode_resize(jpegs):
    if get_lib() is None:
        pytest.skip('native toolchain unavailable')
    batch = decode_jpeg_batch(jpegs, out_hw=(24, 32), num_threads=2)
    assert batch.shape == (4, 24, 32, 3)


def test_native_decode_missing_file(jpegs):
    if get_lib() is None:
        pytest.skip('native toolchain unavailable')
    assert decode_jpeg_batch(jpegs + ['/nonexistent.jpg']) is None


def test_rawframe_decode_native_backend(jpegs, tmp_path):
    """RawFrameDecode(decoding_backend='native') through the pipeline."""
    from vfs_tpu.datasets.pipelines.loading import RawFrameDecode
    results = dict(frame_dir=osp.dirname(jpegs[0]),
                   filename_tmpl='{:05d}.jpg',
                   frame_inds=np.array([0, 1, 2, 3]), modality='RGB')
    out = RawFrameDecode(decoding_backend='native')(results)
    assert len(out['imgs']) == 4
    assert out['imgs'][0].shape == (48, 64, 3)
