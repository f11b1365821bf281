#!/usr/bin/env python
"""Train-step profile for the flagship IoU-aware RetinaNet R-50 (VERDICT r2
item 7: publish where the training milliseconds go + a train-MFU figure).

Times four compiled programs at the production canvas on the real chip:
  full      : fwd + bwd + optimizer (the real train step)
  loss_fwd  : loss forward only (no grad)
  assign    : anchor-target assignment only (no network)
  fwd_feats : backbone+FPN+head forward only (no loss)
Derived: bwd+opt = full - loss_fwd; loss/assign overhead = loss_fwd -
fwd_feats.  Prints one JSON line with ms/step, img/s and train MFU
(3x forward FLOPs / step time / chip peak).

Relay-safe timing: unique inputs per iteration + a scalar carry chained
through iterations, fetch amortized over CHAIN steps (same recipe as
bench.py — see its comments for why).
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
    """Relay-safe timing: fn(carry, *args) -> scalar.  The carry chains
    iterations (serial data dependency prevents elision/overlap) and the
    scalar is FETCHED (float()) once per chain — block_until_ready alone
    does not force real execution on remote-device relays (see bench.py)."""
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
    from ioudet.models import build_detector
    from ioudet.apis.train import (build_optimizer, make_lr_schedule,
                                   make_train_step, make_trainable_mask)

    batch = int(os.environ.get("PROF_BATCH", 8))
    canvas = tuple(int(v) for v in
                   os.environ.get("PROF_CANVAS", "832x1344").split("x"))
    G = 32
    cfg = dict(FLAGSHIP)
    cfg["dtype"] = os.environ.get("PROF_DTYPE", "bfloat16")
    det = build_detector(cfg, TRAIN_CFG, TEST_CFG)

    if os.environ.get("PROF_CPU"):  # wiring smoke test on host
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    params = det.init(jax.random.PRNGKey(0),
                      jnp.zeros((1,) + canvas + (3,), jnp.float32))["params"]

    sched = make_lr_schedule(0.01, dict(policy="step", warmup="linear",
                                        warmup_iters=500, warmup_ratio=1 / 3,
                                        step=[8, 11]), 1000, 12)
    mask = make_trainable_mask(params, frozen_stages=1)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9,
                              weight_decay=1e-4), sched, mask)
    state = dict(params=params, opt_state=tx.init(params),
                 step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(det, tx)

    ih, iw = int(canvas[0] * 0.96), int(canvas[1] * 0.99)

    def make_batch(i):
        xy = rng.uniform(0, canvas[0] * 0.8, (batch, G, 2)).astype(
            np.float32)
        wh = rng.uniform(canvas[0] * 0.04, canvas[0] * 0.35,
                         (batch, G, 2)).astype(np.float32)
        return dict(
            img=jnp.asarray(
                rng.normal(0, 1, (batch,) + canvas + (3,)).astype(
                    np.float32) + np.float32(i) * 1e-3),
            gt_bboxes=jnp.asarray(np.concatenate([xy, xy + wh], -1)),
            gt_labels=jnp.asarray(rng.integers(1, 81, (batch, G)),
                                  jnp.int32),
            gt_valid=jnp.asarray(rng.uniform(size=(batch, G)) < 0.5),
            img_shape=jnp.tile(jnp.asarray([[ih, iw]], jnp.int32),
                               (batch, 1)),
            pad_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32),
                               (batch, 1)),
        )

    batches = [make_batch(i) for i in range(10)]

    # ---- loss-only forward
    @jax.jit
    def loss_fwd(carry, params, b):
        losses = det.apply({"params": params},
                           b["img"] + carry * 1e-30, b["gt_bboxes"],
                           b["gt_labels"], b["gt_valid"], b["img_shape"],
                           b["pad_shape"], method=det.forward_train)
        return sum(jnp.sum(v) for v in losses.values())

    t_loss = timed(lambda c, b: loss_fwd(c, params, b),
                   lambda i: (batches[i % len(batches)],))

    # ---- network forward only
    @jax.jit
    def fwd_feats(carry, params, img):
        outs = det.apply({"params": params}, img + carry * 1e-30)
        return sum(jnp.sum(o[-1]) for o in outs)

    t_fwd = timed(lambda c, im: fwd_feats(c, params, im),
                  lambda i: (batches[i % len(batches)]["img"],))

    # ---- assignment only (anchor_target on the flagship anchor grid)
    from ioudet.core.anchor import anchor_target
    from ioudet.core.bbox import MaxIoUAssigner
    head = det.bbox_head
    featmap_sizes = [(canvas[0] // s, canvas[1] // s)
                     for s in head.anchor_strides]

    @jax.jit
    def assign_only(carry, b):
        anchors, valid = head.get_anchors(featmap_sizes, b["pad_shape"])
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                  min_pos_iou=0.0)
        t = anchor_target(anchors, valid, b["gt_bboxes"] + carry * 1e-30,
                          b["gt_valid"], b["gt_labels"], b["img_shape"],
                          assigner, head.target_means, head.target_stds)
        return t.labels.sum() + t.bbox_targets.sum()

    t_assign = timed(assign_only,
                     lambda i: (batches[i % len(batches)],))

    # ---- full train step LAST: it donates (and deletes) the param buffers
    # state chains through iterations by construction; fetch the step
    # scalar (not block_until_ready) to force real execution per chain
    st = jax.tree.map(jnp.asarray, state)
    st, _ = step_fn(st, batches[-1])  # compile + warmup
    int(st["step"])
    times = []
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(4):
            st, log_vars = step_fn(st, batches[rep * 4 + i])
        int(st["step"])
        times.append((time.perf_counter() - t0) / 4)
    t_full = float(np.median(times))

    flop_fwd = 0.52e12 * batch  # XLA-counted forward cost (see BASELINE.md)
    peak = float(os.environ.get("PROF_PEAK_TFLOPS", 197)) * 1e12
    mfu = 3 * flop_fwd / t_full / peak
    print(json.dumps({
        "batch": batch,
        "ms_full_step": round(t_full * 1e3, 2),
        "ms_loss_fwd": round(t_loss * 1e3, 2),
        "ms_net_fwd": round(t_fwd * 1e3, 2),
        "ms_assign_only": round(t_assign * 1e3, 2),
        "ms_bwd_plus_opt": round((t_full - t_loss) * 1e3, 2),
        "img_per_sec": round(batch / t_full, 2),
        "train_mfu": round(mfu, 3),
    }))


if __name__ == "__main__":
    main()
