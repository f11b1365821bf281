#!/usr/bin/env python
"""Microprobe: per-piece cost of the multiclass-NMS block on the real chip.

The round-5 stage probe pins the batch-16 NMS block at ~14-17 ms of the
~80 ms eval program with zero useful FLOPs.  This times each piece ALONE at
the production shapes (N=5000 candidates/img, C=80, class_topk=4,
pre_nms_total=2000, batch 16), dispatch amortized by chaining REPS
data-dependent iterations inside one jitted program:

  cls_sort    : lax.top_k over (B, 5000, 80) -> k=4
  cls_iter    : _iter_topk same shapes (k argmax passes)
  flat_sort   : lax.top_k over (B, 20000) -> 2000
  flat_thresh : _threshold_topk same shapes (31-pass bit binary search)
  gather      : candidate box gather (B, 2000) from (B, 5000, 4)
  iou_greedy  : bbox_overlaps (2000x2000) + greedy_suppress fixed point
  final_topk  : lax.top_k over (B, 2000) -> 100

Prints one JSON line per piece.  Env: BENCH_BATCH, PROBE_REPS (default 16).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(jnp.float32(0.0), *args)
    float(out)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(out * 1e-30, *args)
        float(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from ioudet.core.post_processing.bbox_nms import (_iter_topk,
                                                      _threshold_topk)
    from ioudet.core.bbox.geometry import bbox_overlaps
    from ioudet.ops.nms import greedy_suppress

    batch = int(os.environ.get("BENCH_BATCH", 16))
    reps = int(os.environ.get("PROBE_REPS", 16))
    n, c, ctopk, pre = 5000, 80, 4, 2000

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.uniform(0, 1, (batch, n, c)).astype(np.float32))
    flat = jnp.asarray(rng.uniform(0, 1, (batch, n * ctopk)).astype(
        np.float32))
    xy = rng.uniform(0, 800, (batch, n, 2)).astype(np.float32)
    wh = rng.uniform(8, 120, (batch, n, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    idx2k = jnp.asarray(rng.integers(0, n, (batch, pre)).astype(np.int32))
    kept = jnp.asarray(rng.uniform(0, 1, (batch, pre)).astype(np.float32))

    def chain(body):
        def fn(carry, *args):
            def step(c, _):
                r = body(c, *args)
                return r, ()
            out, _ = jax.lax.scan(step, carry, None, length=reps)
            return out
        return jax.jit(fn)

    pieces = {}

    pieces["cls_sort"] = (chain(lambda cr, s: jnp.sum(
        jax.lax.top_k(s + cr * 1e-30, ctopk)[0]) * 1e-9), (scores,))
    pieces["cls_iter"] = (chain(lambda cr, s: jnp.sum(
        _iter_topk(s + cr * 1e-30, ctopk)[0]) * 1e-9), (scores,))
    pieces["flat_sort"] = (chain(lambda cr, f: jnp.sum(
        jax.lax.top_k(f + cr * 1e-30, pre)[0]) * 1e-9), (flat,))
    pieces["flat_thresh"] = (chain(lambda cr, f: jnp.sum(
        jax.vmap(lambda v: _threshold_topk(v, pre)[0])(f + cr * 1e-30))
        * 1e-9), (flat,))
    pieces["gather"] = (chain(lambda cr, b, ix: jnp.sum(
        jnp.take_along_axis(b, (ix + (cr * 1e-30).astype(jnp.int32))[
            ..., None], axis=1)) * 1e-9), (boxes, idx2k))

    def iou_greedy(cr, b2k, kv):
        def single(bx, valid):
            iou = bbox_overlaps(bx, bx)
            return greedy_suppress(iou, valid, 0.5)
        b = b2k + cr * 1e-30
        keep = jax.vmap(single)(b, kv > 0.05)
        return jnp.sum(keep.astype(jnp.float32)) * 1e-9
    boxes2k = jnp.take_along_axis(boxes, idx2k[..., None], axis=1)
    pieces["iou_greedy"] = (chain(iou_greedy), (boxes2k, kept))
    pieces["final_topk"] = (chain(lambda cr, kv: jnp.sum(
        jax.lax.top_k(kv + cr * 1e-30, 100)[0]) * 1e-9), (kept,))

    for tag, (fn, args) in pieces.items():
        dt = timed(fn, *args)
        print(json.dumps({tag + "_ms": round(dt / reps * 1e3, 3),
                          "total_s": round(dt, 3)}), flush=True)


if __name__ == "__main__":
    main()
