from .mesh import (init_dist, make_mesh, batch_sharding, replicated,
                   shard_batch)

__all__ = ["init_dist", "make_mesh", "batch_sharding", "replicated",
           "shard_batch"]
