"""Test/eval loop (reference: mmaction/apis/test.py:14-194).

Single-process: iterate the dataset, run ``model.forward_test`` per video.
Multi-host: shard videos by ``jax.process_index()`` and allgather the
pickled per-video results via ``multihost_utils`` — replacing the
reference's pickle->uint8-CUDA-tensor NCCL gather (:152-194) with host
collectives over DCN.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..utils import get_root_logger, terminal_is_available


def single_process_test(model, dataset, progress: bool = True,
                        prefetch: bool = True, devices=None) -> List:
    """Evaluate every video; with ``prefetch`` the next video is decoded
    and transferred to the device (``model.preload``) on a background
    thread while the current one computes — the host link is the
    bottleneck on TPU-VMs (SURVEY §3.2's device-boundary note).

    ``devices``: a list of local devices to round-robin videos over
    (multi-chip hosts; requires ``model.distribute(devices)`` first).
    One worker thread drives each chip — videos are independent, so
    per-chip throughput adds up. Replaces the reference's
    MMDataParallel eval scatter (apis/test.py:143)."""
    import concurrent.futures

    logger = get_root_logger()
    n = len(dataset)

    if devices is not None and len(devices) > 1:
        return _multi_device_test(model, dataset, devices, progress, logger)

    results = []

    def fetch(i):
        sample = dataset[i]
        imgs = sample['imgs']
        # (num_clips, T, H, W, C) -> (T, H, W, C); eval uses one clip
        if imgs.ndim == 5:
            assert imgs.shape[0] == 1
            imgs = imgs[0]
        if prefetch and hasattr(model, 'preload'):
            imgs = model.preload(imgs)
        return sample, imgs

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1) \
        if prefetch else None
    pending = pool.submit(fetch, 0) if pool else None
    # trackers support pipelined readback: dispatch video i+1's compute
    # before resolving video i's (link-bound) prediction fetch
    import inspect
    try:
        defer = 'defer_fetch' in inspect.signature(
            model.forward_test).parameters
    except (TypeError, ValueError):
        defer = False
    prev_finish = None
    for i in range(n):
        if pool:
            sample, imgs = pending.result()
            if i + 1 < n:
                pending = pool.submit(fetch, i + 1)
        else:
            sample, imgs = fetch(i)
        if defer:
            finish = model.forward_test(imgs, sample['ref_seg_map'],
                                        [sample['img_meta']],
                                        defer_fetch=True)
            if prev_finish is not None:
                results.extend(prev_finish())
            prev_finish = finish
        else:
            results.extend(model.forward_test(imgs, sample['ref_seg_map'],
                                              [sample['img_meta']]))
        if progress:
            logger.info(f'eval [{i + 1}/{n}] '
                        f'{sample["img_meta"].get("frame_dir", "")}')
    if prev_finish is not None:
        results.extend(prev_finish())
    if pool:
        pool.shutdown(wait=False)
    return results


def _multi_device_test(model, dataset, devices, progress, logger) -> List:
    """Round-robin videos over local chips, one worker thread per chip.

    Each thread owns device ``devices[t]``: it decodes, transfers
    (``model.preload(..., device=dev)``) and propagates its share of the
    videos there, while the other chips do the same concurrently (JAX
    releases the GIL while a thread blocks on its device). Results keep
    dataset order.
    """
    import concurrent.futures

    if hasattr(model, 'distribute'):
        model.distribute(devices)
    n = len(dataset)
    results: List = [None] * n
    done = [0]
    import threading
    lock = threading.Lock()

    import inspect
    try:
        defer = 'defer_fetch' in inspect.signature(
            model.forward_test).parameters
    except (TypeError, ValueError):
        defer = False

    def worker(t):
        dev = devices[t]
        # per-chip pipelined readback: the thread dispatches video i+1's
        # compute on its chip before resolving video i's fetch (same
        # pattern as the single-device loop)
        prev = None  # (index, finish)
        for i in range(t, n, len(devices)):
            sample = dataset[i]
            imgs = sample['imgs']
            if imgs.ndim == 5:
                assert imgs.shape[0] == 1
                imgs = imgs[0]
            if hasattr(model, 'preload'):
                imgs = model.preload(imgs, device=dev)
            if defer:
                finish = model.forward_test(imgs, sample['ref_seg_map'],
                                            [sample['img_meta']],
                                            defer_fetch=True)
                if prev is not None:
                    results[prev[0]] = prev[1]()
                prev = (i, finish)
            else:
                results[i] = model.forward_test(imgs,
                                                sample['ref_seg_map'],
                                                [sample['img_meta']])
            if progress:
                with lock:
                    done[0] += 1
                    logger.info(
                        f'eval [{done[0]}/{n}] (chip {t}) '
                        f'{sample["img_meta"].get("frame_dir", "")}')
        if prev is not None:
            results[prev[0]] = prev[1]()

    with concurrent.futures.ThreadPoolExecutor(len(devices)) as pool:
        futures = [pool.submit(worker, t) for t in range(len(devices))]
        for f in futures:
            f.result()  # surface worker exceptions
    flat: List = []
    for preds in results:
        flat.extend(preds)
    return flat


def multi_process_test(model, dataset) -> List:
    """Shard videos across JAX processes; gather results on every host.

    Each host evaluates videos ``i % num_processes == process_index``; the
    per-video prediction arrays are numpy, exchanged via
    ``multihost_utils.broadcast_one_to_all`` per owner (simple and
    bandwidth-fine at DAVIS scale).
    """
    import jax
    nproc = jax.process_count()
    if nproc == 1:
        return single_process_test(model, dataset)
    from jax.experimental import multihost_utils
    pidx = jax.process_index()
    n = len(dataset)
    local = {}
    for i in range(n):
        if i % nproc != pidx:
            continue
        sample = dataset[i]
        imgs = sample['imgs']
        if imgs.ndim == 5:
            imgs = imgs[0]
        preds = model.forward_test(imgs, sample['ref_seg_map'],
                                   [sample['img_meta']])
        local[i] = preds[0]
    # gather: every index owned by exactly one process. Two-phase broadcast
    # (shape+dtype first, then payload) since broadcast_one_to_all needs
    # congruent shapes on all hosts.
    results: List = [None] * n
    for i in range(n):
        owner = i % nproc
        is_src = owner == pidx
        if is_src:
            arr = np.ascontiguousarray(local[i])
            header = np.array([arr.ndim] + list(arr.shape) + [0] * (8 - arr.ndim),
                              np.int64)
        else:
            arr = None
            header = np.zeros((9,), np.int64)
        header = np.asarray(multihost_utils.broadcast_one_to_all(
            header, is_source=is_src))
        shape = tuple(int(x) for x in header[1:1 + int(header[0])])
        payload = arr.astype(np.float32) if is_src else np.zeros(
            shape, np.float32)
        gathered = multihost_utils.broadcast_one_to_all(
            payload, is_source=is_src)
        results[i] = np.asarray(gathered)
    return results
