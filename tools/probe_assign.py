#!/usr/bin/env python
"""Micro-breakdown of the anchor-assignment cost at the flagship train shape
(VERDICT r3 next-item 2: attack the non-conv half of the train step).

Times, per compiled program at (B=8, A=~210k, G=32) on the real chip:
  anchors   : get_anchors (grid anchors + per-image valid flags)
  overlaps  : (B, G, A) IoU matrix alone
  assign    : assign_max_iou from a precomputed overlap matrix
  target    : full anchor_target (assignment + table lookup + deltas)
Prints one JSON line; the same relay-safe chained-carry recipe as
tools/profile_train.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, make_args, iters=8, chain=4):
    args_list = [make_args(i) for i in range(iters + chain)]
    carry = jnp.float32(0.0)
    for a in args_list[iters:]:
        carry = fn(carry, *a)
    float(carry)
    times = []
    for rep in range(iters // chain):
        t0 = time.perf_counter()
        for i in range(chain):
            carry = fn(carry, *args_list[rep * chain + i])
        float(carry)
        times.append((time.perf_counter() - t0) / chain)
    return float(np.median(times))


def main():
    if os.environ.get("PROF_CPU"):
        jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import FLAGSHIP, TRAIN_CFG, TEST_CFG
    from ioudet.models import build_detector
    from ioudet.core.anchor import anchor_target
    from ioudet.core.bbox import MaxIoUAssigner
    from ioudet.core.bbox.geometry import bbox_overlaps
    from ioudet.core.bbox.assigners import assign_max_iou

    batch = int(os.environ.get("PROF_BATCH", 8))
    canvas = tuple(int(v) for v in
                   os.environ.get("PROF_CANVAS", "832x1344").split("x"))
    G = 32
    det = build_detector(dict(FLAGSHIP), TRAIN_CFG, TEST_CFG)
    head = det.bbox_head
    featmap_sizes = [(canvas[0] // s, canvas[1] // s)
                     for s in head.anchor_strides]
    rng = np.random.default_rng(0)
    ih, iw = int(canvas[0] * 0.96), int(canvas[1] * 0.99)

    def make_batch(i):
        xy = rng.uniform(0, canvas[0] * 0.8, (batch, G, 2)).astype(np.float32)
        wh = rng.uniform(canvas[0] * 0.04, canvas[0] * 0.35,
                         (batch, G, 2)).astype(np.float32)
        return dict(
            gt_bboxes=jnp.asarray(np.concatenate([xy, xy + wh], -1)
                                  + np.float32(i) * 1e-3),
            gt_labels=jnp.asarray(rng.integers(1, 81, (batch, G)), jnp.int32),
            gt_valid=jnp.asarray(rng.uniform(size=(batch, G)) < 0.5),
            img_shape=jnp.tile(jnp.asarray([[ih, iw]], jnp.int32), (batch, 1)),
            pad_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32),
                               (batch, 1)),
        )

    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0.0)

    @jax.jit
    def anchors_only(carry, b):
        anchors, valid = head.get_anchors(featmap_sizes,
                                          b["pad_shape"] + carry.astype(jnp.int32) * 0)
        return anchors.sum() + valid.sum()

    @jax.jit
    def overlaps_only(carry, b):
        anchors, valid = head.get_anchors(featmap_sizes, b["pad_shape"])
        ov = jax.vmap(lambda g: bbox_overlaps(g, anchors))(
            b["gt_bboxes"] + carry * 1e-30)
        return ov.sum()

    @jax.jit
    def assign_from_ov(carry, b):
        anchors, valid = head.get_anchors(featmap_sizes, b["pad_shape"])
        def one(g, gv, av):
            ov = bbox_overlaps(g, anchors)
            r = assign_max_iou(ov, gv, av)
            return r.gt_inds.sum() + r.max_overlaps.sum()
        return jnp.sum(jax.vmap(one)(b["gt_bboxes"] + carry * 1e-30,
                                     b["gt_valid"], valid))

    @jax.jit
    def target_full(carry, b):
        anchors, valid = head.get_anchors(featmap_sizes, b["pad_shape"])
        t = anchor_target(anchors, valid, b["gt_bboxes"] + carry * 1e-30,
                          b["gt_valid"], b["gt_labels"], b["img_shape"],
                          assigner, head.target_means, head.target_stds)
        return t.labels.sum() + t.bbox_targets.sum() + t.label_weights.sum()

    batches = [make_batch(i) for i in range(10)]
    out = {}
    for name, fn in [("ms_anchors", anchors_only),
                     ("ms_overlaps", overlaps_only),
                     ("ms_assign", assign_from_ov),
                     ("ms_target_full", target_full)]:
        t = timed(fn, lambda i: (batches[i % len(batches)],))
        out[name] = round(t * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
