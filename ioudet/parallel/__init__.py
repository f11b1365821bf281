from .mesh import (init_dist, make_mesh, batch_sharding, replicated,
                   shard_batch)
from .spatial import make_spatial_mesh, spatial_predict_fn

__all__ = ["init_dist", "make_mesh", "batch_sharding", "replicated",
           "shard_batch", "make_spatial_mesh", "spatial_predict_fn"]
