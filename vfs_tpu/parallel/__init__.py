from .mesh import (create_mesh, data_sharding, init_dist, replicated,
                   shard_batch)

__all__ = ['create_mesh', 'data_sharding', 'init_dist', 'replicated',
           'shard_batch']
