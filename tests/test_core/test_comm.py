"""Cross-replica comm helpers on the 8-device virtual CPU mesh.

Covers the SURVEY §2.8 inventory rows the GSPMD path doesn't exercise
implicitly: concat_all_gather, batch shuffle/unshuffle (MoCo shuffled
BN), explicit grad all-reduce, and log-var averaging (reference
mmaction/models/common/utils.py:68-163, core/dist_utils.py:30-49,
models/trackers/base.py:104-108).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vfs_tpu.parallel import (allreduce_grads, batch_shuffle,
                              batch_unshuffle, concat_all_gather,
                              concat_all_gather_sharded, create_mesh,
                              reduce_log_vars, shard_batch)

N_DEV = 8
PER_DEV = 3


@pytest.fixture(scope='module')
def mesh():
    assert jax.device_count() >= N_DEV
    return create_mesh(('data',))


def _smap(fn, mesh, in_specs, out_specs):
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


def test_concat_all_gather(mesh):
    x = jnp.arange(N_DEV * PER_DEV * 4, dtype=jnp.float32).reshape(
        N_DEV * PER_DEV, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P('data')))
    out = _smap(concat_all_gather, mesh, (P('data'),), P('data'))(xs)
    # every replica returned the full batch -> output leading dim = world * n
    assert out.shape == (N_DEV * N_DEV * PER_DEV, 4)
    for r in range(N_DEV):
        np.testing.assert_array_equal(
            np.asarray(out[r * N_DEV * PER_DEV:(r + 1) * N_DEV * PER_DEV]),
            np.asarray(x))


def test_concat_all_gather_stops_gradient(mesh):
    x = jnp.ones((N_DEV, 2))
    xs = jax.device_put(x, NamedSharding(mesh, P('data')))

    def loss(a):
        def inner(v):
            return (concat_all_gather(v).sum() +
                    (2.0 * v).sum()).reshape(1)
        per = _smap(inner, mesh, (P('data'),), P('data'))(a)
        return per.sum()

    g = jax.grad(loss)(xs)
    # only the local 2x term contributes: gathered copies carry no grad
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones((N_DEV, 2)))


def test_batch_shuffle_roundtrip(mesh):
    n = N_DEV * PER_DEV
    x = jnp.arange(n * 5, dtype=jnp.float32).reshape(n, 5)
    xs = jax.device_put(x, NamedSharding(mesh, P('data')))
    rng = jax.random.PRNGKey(0)

    def go(a, key):
        shuf, inv = batch_shuffle(a, key)
        back = batch_unshuffle(shuf, inv)
        return shuf, back

    shuf, back = _smap(go, mesh, (P('data'), P()), (P('data'), P('data')))(
        xs, rng)
    # roundtrip restores the original order exactly
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # the shuffle is a permutation of the global batch and actually moves
    # rows across replica boundaries
    s = np.asarray(shuf)
    assert sorted(s[:, 0].tolist()) == x[:, 0].tolist()
    assert not np.array_equal(s, np.asarray(x))


def test_allreduce_grads_and_log_vars(mesh):
    grads = {
        'w': jnp.arange(N_DEV * 2, dtype=jnp.float32).reshape(N_DEV, 2),
        'b': jnp.arange(N_DEV, dtype=jnp.float32).reshape(N_DEV, 1),
    }
    gs = jax.tree.map(
        lambda g: jax.device_put(g, NamedSharding(mesh, P('data'))), grads)

    def go(g):
        red = allreduce_grads(g)
        logs = reduce_log_vars({'loss': g['b'].sum()})
        return red, logs['loss'].reshape(1)

    red, loss = _smap(go, mesh,
                      ({'w': P('data'), 'b': P('data')},),
                      ({'w': P('data'), 'b': P('data')}, P('data')))(gs)
    # every replica's slice equals the global per-leaf mean
    w_mean = np.asarray(grads['w']).reshape(N_DEV, 1, 2).mean(0)
    np.testing.assert_allclose(np.asarray(red['w']),
                               np.tile(w_mean, (N_DEV, 1)))
    # log var: mean over replicas of the per-replica scalar sum
    np.testing.assert_allclose(np.asarray(loss),
                               np.full(N_DEV, np.arange(N_DEV).mean()))


def test_concat_all_gather_sharded(mesh):
    x = np.arange(N_DEV * 2 * 3, dtype=np.float32).reshape(N_DEV * 2, 3)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P('data')))
    out = concat_all_gather_sharded(xs, mesh)
    np.testing.assert_array_equal(np.asarray(out), x)
    assert out.sharding.is_fully_replicated
