"""GSPMD spatial partitioning of the conv grid — ultra-high-res inference.

The reference has no analog (SURVEY §5.7: a CNN detector has no sequence
axis; its images fit one GPU).  On TPU the idiomatic scale-out when a
single image's activations exceed one chip's HBM — gigapixel inputs,
remote-sensing tiles — is to shard the image's ROW axis across an ICI mesh
axis and let XLA's GSPMD partitioner insert the convolution halo exchanges
automatically.  No manual tiling, no hand-written collectives: the SAME
``simple_test`` program is jitted with a 2-D ``('data', 'spatial')`` mesh
and an input sharding of ``P('data', 'spatial')`` on (B, H, W, 3); every
conv/pool in backbone+FPN+head runs on row-shards with compiler-emitted
``ppermute`` halos, and the decode/top-k/NMS tail (which ranks anchors
globally per image) is re-gathered by the partitioner where it needs to be.

This is an INFERENCE path: BN is frozen at test time, so spatial sharding
is numerically exact (no cross-shard statistics).  Outputs match the
unsharded program to float tolerance — asserted by
tests/test_spatial_partition.py on a virtual (data=2, spatial=4) CPU mesh.

Usage::

    mesh = make_spatial_mesh(n_spatial=4)          # (data=N/4, spatial=4)
    predict = spatial_predict_fn(det, mesh)
    dets, labels = predict(params, imgs, img_shapes, scale_factors,
                           pad_shapes)

The canvas height does not need to divide the spatial axis — GSPMD pads
internally — but throughput is best when it does (no ragged shard).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(n_spatial: int, n_data: Optional[int] = None,
                      devices=None) -> Mesh:
    """A 2-D ``('data', 'spatial')`` mesh.

    ``n_spatial`` devices cooperate on each image's rows; the remaining
    factor runs data parallel.  Total devices used = n_data * n_spatial.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    use = n_data * n_spatial
    if use < 1 or use > len(devices):
        raise ValueError(
            f"need {n_data}x{n_spatial} devices, have {len(devices)}")
    return Mesh(np.array(devices[:use]).reshape(n_data, n_spatial),
                ("data", "spatial"))


def spatial_predict_fn(det, mesh: Mesh):
    """Jit ``det.simple_test`` over ``mesh`` with rows spatially sharded.

    Returns ``predict(params, imgs, img_shapes, scale_factors, pad_shapes)
    -> (dets, labels)`` where ``imgs`` is (B, H, W, 3) with B divisible by
    the mesh's ``data`` extent.  Params are replicated; images are sharded
    ``P('data', 'spatial')``; per-image metadata rides the ``data`` axis;
    detections come back sharded only on ``data`` (each image's boxes are
    whole on its data shard).
    """
    repl = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P("data", "spatial"))
    meta_sh = NamedSharding(mesh, P("data"))

    @jax.jit
    def _predict(params, imgs, img_shapes, scale_factors, pad_shapes):
        imgs = jax.lax.with_sharding_constraint(imgs, img_sh)
        dets, labels = det.apply({"params": params}, imgs, img_shapes,
                                 scale_factors, pad_shapes,
                                 method=det.simple_test)
        out_sh = NamedSharding(mesh, P("data"))
        return (jax.lax.with_sharding_constraint(dets, out_sh),
                jax.lax.with_sharding_constraint(labels, out_sh))

    def predict(params, imgs, img_shapes, scale_factors, pad_shapes):
        params = jax.device_put(params, repl)
        imgs = jax.device_put(imgs, img_sh)
        img_shapes = jax.device_put(img_shapes, meta_sh)
        scale_factors = jax.device_put(scale_factors, meta_sh)
        pad_shapes = jax.device_put(pad_shapes, meta_sh)
        return _predict(params, imgs, img_shapes, scale_factors, pad_shapes)

    return predict
