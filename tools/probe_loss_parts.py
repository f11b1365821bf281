#!/usr/bin/env python
"""Per-component attribution of the train-step LOSS path (VERDICT r3 #2).

Standalone micro-probes are useless here: every dispatched program pays a
~4-10 ms relay floor, so a 3 ms component reads as 10 ms (see
tools/probe_assign.py, where four very different programs all cluster at
~10 ms).  Instead this probe times CUMULATIVE programs that each add one
loss component on top of the previous one — the relay constant cancels in
the differences:

  net      : backbone+FPN+head forward (the conv work)
  +assign  : + get_anchors + anchor_target          -> d_assign
  +cls     : + fused focal over the 5 levels        -> d_focal
  +bbox    : + smooth-L1 on the flat regression     -> d_smoothl1
  +iou     : + decode + aligned IoU + BCE branch    -> d_ioubranch
             (== the full forward_train term set)

All programs use the chained-carry + fetch recipe (see bench.py).  Prints
one JSON line with the absolute times and the differences.
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
    from __graft_entry__ import FLAGSHIP, TRAIN_CFG, TEST_CFG
    from ioudet.core.anchor import anchor_target
    from ioudet.core.bbox import MaxIoUAssigner, bbox_overlaps, delta2bbox
    from ioudet.models import build_detector
    from ioudet.models.losses.cross_entropy_loss import (
        binary_cross_entropy_with_logits)

    batch = int(os.environ.get("PROF_BATCH", 8))
    canvas = tuple(int(v) for v in
                   os.environ.get("PROF_CANVAS", "832x1344").split("x"))
    G = 32
    cfg = dict(FLAGSHIP)
    cfg["dtype"] = "bfloat16"
    det = build_detector(cfg, TRAIN_CFG, TEST_CFG)
    head = det.bbox_head
    assigner = MaxIoUAssigner(**{k: v for k, v in
                                 TRAIN_CFG["assigner"].items()
                                 if k != "type"})

    rng = np.random.default_rng(0)
    params = det.init(jax.random.PRNGKey(0),
                      jnp.zeros((1,) + canvas + (3,), jnp.float32))["params"]
    ih, iw = int(canvas[0] * 0.96), int(canvas[1] * 0.99)

    def make_batch(i):
        xy = rng.uniform(0, canvas[0] * 0.8, (batch, G, 2)).astype(np.float32)
        wh = rng.uniform(canvas[0] * 0.04, canvas[0] * 0.35,
                         (batch, G, 2)).astype(np.float32)
        return dict(
            img=jnp.asarray(rng.normal(0, 1, (batch,) + canvas + (3,))
                            .astype(np.float32) + np.float32(i) * 1e-3),
            gt_bboxes=jnp.asarray(np.concatenate([xy, xy + wh], -1)),
            gt_labels=jnp.asarray(rng.integers(1, 81, (batch, G)), jnp.int32),
            gt_valid=jnp.asarray(rng.uniform(size=(batch, G)) < 0.5),
            img_shape=jnp.tile(jnp.asarray([[ih, iw]], jnp.int32),
                               (batch, 1)),
            pad_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32),
                               (batch, 1)),
        )

    batches = [make_batch(i) for i in range(10)]

    def net_and_targets(b, carry, upto):
        """Shared builder: run the net, then the first `upto` loss stages."""
        outs = det.apply({"params": params}, b["img"] + carry * 1e-30)
        cls_scores, bbox_preds, iou_preds = outs
        acc = sum(jnp.sum(o[-1].astype(jnp.float32)) for o in outs)
        if upto == 0:
            return acc
        # trace-time static sizes from the ACTUAL conv outputs (ceil pads)
        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        anchors, valid = head.get_anchors(featmap_sizes, b["pad_shape"])
        targets = anchor_target(
            anchors, valid, b["gt_bboxes"], b["gt_valid"], b["gt_labels"],
            b["img_shape"], assigner, head.target_means, head.target_stds,
            allowed_border=TRAIN_CFG.get("allowed_border", -1),
            pos_weight=TRAIN_CFG.get("pos_weight", -1))
        num_pos = jnp.maximum(targets.num_total_pos, 1).astype(jnp.float32)
        acc = acc + jnp.sum(targets.labels) + jnp.sum(targets.bbox_targets)
        if upto == 1:
            return acc
        acc = acc + head._cls_loss_from_levels(
            cls_scores, targets.labels, targets.label_weights,
            avg_factor=num_pos)
        if upto == 2:
            return acc
        box_flat = head._flatten_levels(bbox_preds, 4)
        acc = acc + head._loss_bbox_fn()(
            box_flat.reshape(-1, 4), targets.bbox_targets.reshape(-1, 4),
            weight=targets.bbox_weights.reshape(-1, 4), avg_factor=num_pos)
        if upto == 3:
            return acc
        iou_flat = head._flatten_levels(iou_preds, 1)[..., 0]
        pos_mask = targets.bbox_weights[..., 0]
        decoded = delta2bbox(anchors[None, :, :], box_flat,
                             head.target_means, head.target_stds)
        iou_target = jax.lax.stop_gradient(
            bbox_overlaps(decoded, targets.pos_gt_boxes, is_aligned=True))
        loss_iou = binary_cross_entropy_with_logits(iou_flat, iou_target)
        return acc + jnp.sum(loss_iou * pos_mask) / num_pos

    stages = ["net", "assign", "cls", "bbox", "iou"]
    abs_ms = {}
    for upto, name in enumerate(stages):
        fn = jax.jit(lambda c, b, u=upto: net_and_targets(b, c, u))
        abs_ms[name] = round(
            timed(fn, lambda i: (batches[i % len(batches)],)) * 1e3, 2)

    out = {"batch": batch, **{f"ms_{k}": v for k, v in abs_ms.items()}}
    for a, b in zip(stages[1:], stages[:-1]):
        out[f"d_{a}"] = round(abs_ms[a] - abs_ms[b], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
