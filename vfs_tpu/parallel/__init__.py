from .comm import (allreduce_grads, batch_shuffle, batch_unshuffle,
                   concat_all_gather, concat_all_gather_sharded,
                   reduce_log_vars)
from .mesh import (create_mesh, data_sharding, host_to_global, init_dist,
                   replicate_tree, replicated, shard_batch,
                   shard_local_batch)

__all__ = ['create_mesh', 'data_sharding', 'init_dist', 'replicated',
           'shard_batch', 'shard_local_batch', 'concat_all_gather',
           'batch_shuffle', 'batch_unshuffle', 'allreduce_grads',
           'reduce_log_vars', 'concat_all_gather_sharded',
           'host_to_global', 'replicate_tree']
