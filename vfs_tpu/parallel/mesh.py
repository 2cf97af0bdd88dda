"""Device mesh + sharding helpers.

The reference's entire §2.8 distributed stack (torch.distributed.launch,
NCCL DDP, SyncBN, DistributedSampler) maps to: one ``jax.sharding.Mesh``,
batch arrays sharded on the ``data`` axis, parameters replicated, and XLA
GSPMD inserting the gradient/BN collectives over ICI. ``init_dist`` becomes
``jax.distributed.initialize`` (multi-host only).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_dist(launcher: Optional[str] = None, **kwargs):
    """Multi-host process-group init (reference tools/train.py:116
    ``init_dist``). No-op for single-host; under a multi-host launcher the
    coordinator env vars are picked up by jax.distributed."""
    if launcher in (None, 'none'):
        return
    jax.distributed.initialize(**kwargs)


def create_mesh(axis_names: Sequence[str] = ('data',),
                axis_sizes: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == n, \
        f'mesh {axis_sizes} != {n} devices'
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_to_global(x, sharding: NamedSharding):
    """Place a host array onto a (possibly multi-process) sharding.

    Single-process: plain ``device_put``. Multi-process: every host is
    assumed to hold the SAME full (global) array; each host device_puts
    only the index-slices its addressable devices own and the global
    jax.Array is assembled with
    ``make_array_from_single_device_arrays`` — the multihost replacement
    for the reference's DistributedSampler shard + scatter
    (reference datasets/samplers/distributed_sampler.py:5-33)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    imap = sharding.devices_indices_map(x.shape)
    arrs = [jax.device_put(x[imap[d]], d)
            for d in sharding.addressable_devices]
    return jax.make_array_from_single_device_arrays(x.shape, sharding,
                                                    arrs)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a host pytree over every device of the mesh
    (multi-process safe)."""
    repl = replicated(mesh)
    return jax.tree.map(
        lambda x: host_to_global(x, repl) if hasattr(x, 'ndim') else x,
        tree)


def shard_local_batch(batch, mesh: Mesh, axis: str = 'data'):
    """Assemble a GLOBAL sharded batch from per-process LOCAL batches.

    The training loader yields each process its OWN shard
    (``build_dataloader(num_shards=process_count)``), so hosts hold
    DIFFERENT data — the opposite of :func:`shard_batch`'s multihost
    contract (identical global array on every host). Feeding local
    shards through ``shard_batch`` silently assembles a "replicated"
    array whose replicas differ per process, and every downstream
    GSPMD step desynchronizes (caught by the 2-process full-train-loop
    test: run A's rank-0 checkpoint != run B's live state on rank 1).
    This is the multihost equivalent of the reference's
    DistributedSampler shard + per-GPU scatter
    (reference datasets/samplers/distributed_sampler.py:5-33)."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    sharded = data_sharding(mesh, axis)

    def put(x):
        if not hasattr(x, 'ndim') or x.ndim == 0:
            return x
        return jax.make_array_from_process_local_data(
            sharded, np.ascontiguousarray(x))

    return jax.tree.map(put, batch)


def shard_batch(batch, mesh: Mesh, axis: str = 'data'):
    """Device-put a host batch dict with the batch dim sharded over the
    mesh. Arrays whose leading dim does not divide the mesh fall back to
    replication (tiny smoke batches). Multi-process: every host must
    hold the SAME full (global) array — per-process loader shards go
    through :func:`shard_local_batch` instead."""
    sharded = data_sharding(mesh, axis)
    repl = replicated(mesh)
    n = mesh.shape[axis]

    def put(x):
        if not hasattr(x, 'ndim') or x.ndim == 0:
            return x
        if x.shape[0] % n == 0:
            return host_to_global(x, sharded)
        return host_to_global(x, repl)

    return jax.tree.map(put, batch)
