#!/usr/bin/env python
"""On-TPU Pallas exactness verification (VERDICT r4 next #6).

The CI suite runs on CPU where every Pallas call takes ``interpret=True`` —
the Mosaic LOWERING (on which e.g. assign_pallas's bit-exact ``iou ==
gt_max`` tie argument relies) is never asserted where it actually runs.
This tool executes the three Pallas kernels COMPILED on the real chip and
asserts exactness against the XLA reference paths:

  * ops/assign_pallas.fused_anchor_assign  vs  anchor_target_single (vmap)
    — exact integer/float equality on adversarial tie cases;
  * ops/nms_pallas.{suppression_matrix, greedy_nms_pallas,
    greedy_keep_pallas}  vs  ops/nms.greedy_suppress — bit-equal keep masks;
  * ops/focal_pallas.{focal_level_sum, focal_level_dx}  vs  the production
    jnp focal formula + its autodiff — to fp32-sum tolerance.

Prints one JSON line per check and a final ``{"ok": true}``; exits nonzero
on any mismatch.  tests/test_on_tpu.py (env-gated, IOUDET_TPU_TESTS=1) runs
this in a subprocess so the assertion is part of the suite when a chip is
present.  The recorded output of a real run lives in docs/MODEL_ZOO.md
(round-5 section).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import jax
import jax.numpy as jnp
import numpy as np


def check_assign():
    from ioudet.core.bbox import MaxIoUAssigner
    from ioudet.ops.assign_pallas import fused_anchor_assign
    from test_assign_pallas import _random_case, _reference

    rng = np.random.default_rng(0)
    n_checked = 0
    for A, min_pos, pw in ((512, 0.0, -1.0), (300, 0.0, 1.5), (640, 0.3, -1.0)):
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                  min_pos_iou=min_pos)
        anchors, valid, gt, gtv, gtl = _random_case(rng, 2, A, 12)
        fused = fused_anchor_assign(anchors, valid, gt, gtv, gtl,
                                    pos_iou_thr=0.5, neg_iou_thr=0.4,
                                    min_pos_iou=min_pos, pos_weight=pw)
        ref = _reference(anchors, valid, gt, gtv, gtl, assigner,
                         (0., 0., 0., 0.), (1., 1., 1., 1.), pos_weight=pw)
        labels, lw, posf, bt, pgb = jax.device_get(fused)
        rl, rlw, rbt, rbw, rpgb = [np.asarray(x) for x in ref[:5]]
        np.testing.assert_array_equal(labels, rl)
        np.testing.assert_array_equal(lw, np.asarray(rlw))
        np.testing.assert_array_equal(posf, np.asarray(rbw)[..., 0])
        pos = posf.astype(bool)
        np.testing.assert_array_equal(bt[pos], rbt[pos])
        np.testing.assert_array_equal(pgb[pos], rpgb[pos])
        n_checked += 1
    print(json.dumps({"check": "assign_pallas", "cases": n_checked,
                      "exact": True}), flush=True)


def check_nms():
    from ioudet.core.bbox.geometry import bbox_overlaps
    from ioudet.ops.nms import greedy_suppress
    from ioudet.ops.nms_pallas import (greedy_keep_pallas, greedy_nms_pallas,
                                       suppression_matrix)
    from test_nms_pallas import sorted_boxes

    rng = np.random.default_rng(7)
    n_checked = 0
    # greedy_keep_pallas (the production multiclass_nms entry) pads any N
    # internally; the lower-level greedy_nms_pallas / suppression_matrix
    # require N % 128 == 0 (their callers pad first), so only the padded
    # sizes exercise those.
    for n, seed in ((128, 0), (100, 1), (256, 2)):
        b = jnp.asarray(sorted_boxes(n, seed))
        valid = jnp.asarray(rng.uniform(size=n) < 0.85)
        keep_x = np.asarray(greedy_suppress(bbox_overlaps(b, b), valid, 0.5))
        np.testing.assert_array_equal(
            np.asarray(greedy_keep_pallas(b, valid, 0.5)), keep_x)
        if n % 128 == 0:
            np.testing.assert_array_equal(
                np.asarray(greedy_nms_pallas(b, valid, 0.5)), keep_x)
            supp = np.asarray(suppression_matrix(b, 0.5))
            iou = np.asarray(bbox_overlaps(b, b))
            rows, cols = np.indices(iou.shape)
            np.testing.assert_array_equal(
                supp, ((iou > 0.5) & (cols > rows)).astype(np.float32))
        n_checked += 1
    print(json.dumps({"check": "nms_pallas", "cases": n_checked,
                      "exact": True}), flush=True)


def check_focal():
    from ioudet.models.losses.focal_loss import _fused_focal_sum_impl
    from ioudet.ops.focal_pallas import focal_level_dx, focal_level_sum

    rng = np.random.default_rng(3)
    n_checked = 0
    for b, h, w, A, C in ((2, 6, 9, 3, 7), (1, 13, 21, 9, 80)):
        logits = jnp.asarray(rng.normal(0, 4, (b, h, w, A * C)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, C + 1, (b, h * w * A)),
                             jnp.int32)
        lw = jnp.asarray(rng.uniform(size=(b, h * w * A)) < 0.8, jnp.float32)
        got = float(focal_level_sum(logits, labels, lw, 2.0, 0.25, A))
        want = float(_fused_focal_sum_impl(logits, labels, lw, 2.0, 0.25, A))
        np.testing.assert_allclose(got, want, rtol=1e-5)
        dx = focal_level_dx(jnp.float32(1.0), logits, labels, lw,
                            2.0, 0.25, A)
        g_ref = jax.grad(lambda x: _fused_focal_sum_impl(
            x, labels, lw, 2.0, 0.25, A))(logits)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)
        n_checked += 1
    print(json.dumps({"check": "focal_pallas", "cases": n_checked,
                      "tolerance": "fp32-sum"}), flush=True)


def main():
    backend = jax.default_backend()
    if backend == "cpu":
        print(json.dumps({"ok": False,
                          "error": "no accelerator: would run interpret "
                                   "mode, which CI already covers"}))
        sys.exit(2)
    print(json.dumps({"backend": backend,
                      "device": str(jax.devices()[0])}), flush=True)
    check_assign()
    check_nms()
    check_focal()
    print(json.dumps({"ok": True, "mosaic_lowering_verified": True}))


if __name__ == "__main__":
    main()
