from .mesh import (init_dist, make_mesh, batch_sharding, replicated,
                   shard_batch, local_device_count, allgather_pytrees)
from .spatial import make_spatial_mesh, spatial_predict_fn

__all__ = ["init_dist", "make_mesh", "batch_sharding", "replicated",
           "shard_batch", "local_device_count", "allgather_pytrees",
           "make_spatial_mesh", "spatial_predict_fn"]
