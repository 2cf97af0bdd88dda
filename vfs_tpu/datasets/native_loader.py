"""ctypes bridge to the native C++ frame loader.

TPU-native equivalent of the reference's decord dependency (SURVEY
§2.9: C++/FFmpeg decode feeding the device via async prefetch);
consumed by RawFrameDecode(decoding_backend='native')
(reference mmaction/datasets/pipelines/loading.py:801-880 uses decord
for the same role).

Builds ``vfs_tpu/native/libframe_loader.so`` on first use (g++ + libjpeg,
both baked into the image) and exposes ``decode_jpeg_batch`` — a
GIL-free threaded JPEG decode+resize into one contiguous uint8 RGB batch.
This is the decord-equivalent native IO path (SURVEY §2.9); callers fall
back to cv2 when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                       'native')
_SRC = osp.join(_NATIVE_DIR, 'frame_loader.cpp')
_SO = osp.join(_NATIVE_DIR, 'libframe_loader.so')

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-ljpeg',
           '-lpthread', '-o', _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        if not osp.isfile(_SO) or (osp.isfile(_SRC) and
                                   os.path.getmtime(_SRC) >
                                   os.path.getmtime(_SO)):
            if not _build():
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib = False
            return None
        lib.fl_decode_batch.restype = ctypes.c_int
        lib.fl_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.fl_probe.restype = ctypes.c_int
        lib.fl_probe.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
        if hasattr(lib, 'fl_decode_batch_yuv420'):
            lib.fl_decode_batch_yuv420.restype = ctypes.c_int
            lib.fl_decode_batch_yuv420.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        _lib = lib
        return lib


def probe_jpeg(path: str) -> Optional[Tuple[int, int]]:
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.fl_probe(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 1:
        return None
    return h.value, w.value


def decode_jpeg_batch(paths: List[str],
                      out_hw: Optional[Tuple[int, int]] = None,
                      num_threads: int = 8) -> Optional[np.ndarray]:
    """Decode JPEGs into one (N, H, W, 3) uint8 RGB array.

    ``out_hw=None`` uses the first frame's native size (all frames of a
    video share it). Returns None if the native path is unavailable or any
    frame fails (caller falls back to cv2)."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    if out_hw is None:
        probed = probe_jpeg(paths[0])
        if probed is None:
            return None
        out_hw = probed
    n = len(paths)
    out = np.empty((n, out_hw[0], out_hw[1], 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.fl_decode_batch(
        arr, n, out_hw[0], out_hw[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    if ok != n:
        return None
    return out


def decode_jpeg_batch_yuv420(paths: List[str],
                             num_threads: int = 8):
    """Decode JPEGs straight to packed planar I420 (no host RGB).

    Returns an ``ops.yuv.Yuv420Frames`` (N, H*W*3/2) in the full-range
    'jpeg' convention — the values the files store; libjpeg's own
    YCbCr->RGB conversion is skipped entirely and the device does it
    fused ahead of conv1 (ops/yuv.py). All frames must share the first
    frame's native (even) size; returns None when the native library is
    unavailable or any frame fails (caller falls back to the RGB path).
    """
    lib = get_lib()
    if lib is None or not paths or not hasattr(lib,
                                               'fl_decode_batch_yuv420'):
        return None
    probed = probe_jpeg(paths[0])
    if probed is None or probed[0] % 2 or probed[1] % 2:
        return None
    h, w = probed
    n = len(paths)
    out = np.empty((n, h * w * 3 // 2), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.fl_decode_batch_yuv420(
        arr, n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    if ok != n:
        return None
    from ..ops.yuv import Yuv420Frames
    return Yuv420Frames(out, (h, w), convention='jpeg')


# ---------------------------------------------------------------------------
# Native FFmpeg video decode (the decord-equivalent .mp4 path; reference
# mmaction/datasets/pipelines/loading.py:801-880)
# ---------------------------------------------------------------------------

_VSRC = osp.join(_NATIVE_DIR, 'video_decoder.cpp')
_VSO = osp.join(_NATIVE_DIR, 'libvideo_decoder.so')

_vlib = None
_vlib_lock = threading.Lock()


def _build_video() -> bool:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _VSRC,
           '-lavformat', '-lavcodec', '-lavutil', '-lswscale',
           '-o', _VSO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def get_video_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the FFmpeg decoder; None if unavailable."""
    global _vlib
    with _vlib_lock:
        if _vlib is not None:
            return _vlib if _vlib is not False else None
        if not osp.isfile(_VSO) or (osp.isfile(_VSRC) and
                                    os.path.getmtime(_VSRC) >
                                    os.path.getmtime(_VSO)):
            if not _build_video():
                _vlib = False
                return None
        try:
            lib = ctypes.CDLL(_VSO)
        except OSError:
            _vlib = False
            return None
        lib.vd_probe.restype = ctypes.c_int
        lib.vd_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double)]
        lib.vd_decode_indices.restype = ctypes.c_int
        lib.vd_decode_indices.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        _vlib = lib
        return lib


def probe_video(path: str) -> Optional[Tuple[int, int, int, float]]:
    """Returns (num_frames, height, width, fps) or None."""
    lib = get_video_lib()
    if lib is None:
        return None
    nf = ctypes.c_int64()
    h = ctypes.c_int()
    w = ctypes.c_int()
    fps = ctypes.c_double()
    rc = lib.vd_probe(path.encode(), ctypes.byref(nf), ctypes.byref(h),
                      ctypes.byref(w), ctypes.byref(fps))
    if rc != 0:
        return None
    return int(nf.value), h.value, w.value, fps.value


def decode_video_indices(path: str, indices,
                         out_hw: Optional[Tuple[int, int]] = None
                         ) -> Optional[np.ndarray]:
    """Decode the (possibly repeated, unordered) frame ``indices`` of a
    video into one (len(indices), H, W, 3) uint8 RGB array.

    Internally decodes each unique index once in ascending order (the
    decord unique-index map, reference loading.py:855-876) with a
    keyframe seek to the first wanted frame, then gathers back to the
    requested order. Returns None when the native path is unavailable
    (caller falls back to cv2)."""
    lib = get_video_lib()
    if lib is None:
        return None
    indices = np.asarray(indices, np.int64).reshape(-1)
    if indices.size == 0:
        return None
    if out_hw is None:
        probed = probe_video(path)
        if probed is None:
            return None
        out_hw = (probed[1], probed[2])
    unique, inverse = np.unique(indices, return_inverse=True)
    buf = np.empty((len(unique), out_hw[0], out_hw[1], 3), np.uint8)
    rc = lib.vd_decode_indices(
        path.encode(), unique.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(unique), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_hw[0], out_hw[1])
    if rc <= 0:
        return None
    return buf[inverse]
