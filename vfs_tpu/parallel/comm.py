"""Cross-replica communication helpers.

TPU-native equivalents of the reference's explicit torch.distributed
helpers (SURVEY §2.8 rows "feature all-gather / batch-shuffle" and
"manual coalesced grad all-reduce"):

- ``concat_all_gather``   <- reference mmaction/models/common/utils.py:68-81
- ``batch_shuffle`` /
  ``batch_unshuffle``     <- reference mmaction/models/common/utils.py:118-163
  (``_batch_shuffle_ddp`` / ``_batch_unshuffle_ddp``, MoCo-style shuffled BN)
- ``allreduce_grads``     <- reference mmaction/core/dist_utils.py:30-49
- ``reduce_log_vars``     <- reference mmaction/models/trackers/base.py:104-108
  (per-step loss-log averaging across the world)

Design notes (why these look nothing like the torch versions):

* Under the framework's default GSPMD training path (batch sharded on a
  1-D ``data`` mesh, params replicated) NONE of these are needed: XLA
  inserts the gradient all-reduce, BatchNorm stats are already global,
  and scalar log vars are computed on the logically-global batch. These
  helpers exist for explicit-SPMD code (``shard_map`` / custom research
  loops) where the reference's helpers would be used — e.g. a MoCo-style
  head that needs a gathered negative bank or shuffled BN.

* They are written against an ``axis_name`` (usable inside ``shard_map``
  or ``pmap``); ``*_sharded`` wrappers apply them over a ``Mesh`` to
  batch-sharded global arrays.

* There is no coalescing knob: bucketing all-reduces is the XLA
  scheduler's job, not the user's.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    'concat_all_gather', 'batch_shuffle', 'batch_unshuffle',
    'allreduce_grads', 'reduce_log_vars', 'concat_all_gather_sharded',
]


def concat_all_gather(x: jax.Array, axis_name: str = 'data') -> jax.Array:
    """Gather the per-replica batch shards of ``x`` into the full global
    batch on every replica, concatenated along dim 0.

    Like the reference helper, the result does NOT carry gradients back
    to other replicas (torch.distributed.all_gather has no gradient);
    ``stop_gradient`` makes that contract explicit rather than silent.
    Use inside ``shard_map``/``pmap`` with a bound ``axis_name``.
    """
    return lax.stop_gradient(lax.all_gather(x, axis_name, tiled=True))


def batch_shuffle(x: jax.Array, rng: jax.Array,
                  axis_name: str = 'data') -> Tuple[jax.Array, jax.Array]:
    """Shuffle the global batch across replicas (shuffled BN, MoCo).

    Returns ``(x_shuffled_local, idx_unshuffle)`` where
    ``idx_unshuffle`` is the global inverse permutation to pass to
    :func:`batch_unshuffle`.

    The reference broadcasts the permutation from rank 0; here every
    replica derives the identical permutation from the same ``rng`` key
    (keys are replicated under SPMD), so no broadcast collective is
    needed — determinism does the synchronisation.
    """
    n_local = x.shape[0]
    world = lax.axis_size(axis_name)
    rank = lax.axis_index(axis_name)
    x_all = concat_all_gather(x, axis_name)
    perm = jax.random.permutation(rng, n_local * world)
    idx_unshuffle = jnp.argsort(perm)
    idx_this = lax.dynamic_slice_in_dim(perm, rank * n_local, n_local)
    return jnp.take(x_all, idx_this, axis=0), idx_unshuffle


def batch_unshuffle(x: jax.Array, idx_unshuffle: jax.Array,
                    axis_name: str = 'data') -> jax.Array:
    """Undo :func:`batch_shuffle`: restore the original batch order and
    return this replica's original slice."""
    n_local = x.shape[0]
    rank = lax.axis_index(axis_name)
    x_all = concat_all_gather(x, axis_name)
    idx_this = lax.dynamic_slice_in_dim(idx_unshuffle, rank * n_local,
                                        n_local)
    return jnp.take(x_all, idx_this, axis=0)


def allreduce_grads(grads, axis_name: str = 'data'):
    """Average a gradient pytree across replicas.

    One call on the whole tree; XLA fuses/buckets the all-reduces itself
    (the reference's manual ``_allreduce_coalesced`` bucketing is the
    compiler's job on TPU).
    """
    return jax.tree.map(lambda g: lax.pmean(g, axis_name), grads)


def reduce_log_vars(log_vars: dict, axis_name: Optional[str] = 'data'):
    """Average scalar log variables across replicas (the reference
    all-reduces every ``log_vars`` entry each step). Pass
    ``axis_name=None`` outside any SPMD context (no-op)."""
    if axis_name is None:
        return log_vars
    return {k: lax.pmean(jnp.asarray(v), axis_name)
            for k, v in log_vars.items()}


def concat_all_gather_sharded(x: jax.Array, mesh: Mesh,
                              axis: str = 'data') -> jax.Array:
    """Global-array convenience wrapper: take a batch-sharded array and
    return it fully replicated (every device holds the concatenation of
    all shards). Outside-of-shard_map analogue of
    :func:`concat_all_gather` — a sharding constraint, letting GSPMD
    insert the all-gather."""
    out = jax.jit(
        lambda a: a,
        out_shardings=NamedSharding(mesh, P()))(x)
    return out
