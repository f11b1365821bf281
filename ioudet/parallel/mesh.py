"""Device-mesh utilities — the framework's entire communication layer.

Replaces the reference's DDP/NCCL machinery (ref: mmdet/apis/train.py
(_dist_train), mmdet/core/utils/dist_utils.py (allreduce_grads,
_allreduce_coalesced), mmdet/apis/env.py (init_dist)) with GSPMD: one
``jax.sharding.Mesh`` with a ``data`` axis; the train step is jitted with
batch arrays sharded on that axis and parameters replicated, and XLA emits
the gradient AllReduce over ICI fused into the backward pass.  There is
deliberately no hand-written collective code.

Multi-host: ``jax.distributed.initialize()`` (the launcher analog) before
mesh creation; eval gathering uses ``multihost_utils.process_allgather``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_dist(backend: str = "jax", **kwargs) -> None:
    """Multi-host bring-up (ref: init_dist).  Safe no-op single-process."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        pass  # single-process / already initialized


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data mesh by default; extra axes reserved for future model
    parallelism (the detector is small — DP is the whole story, as in the
    reference)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device_put a host batch with the batch axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
