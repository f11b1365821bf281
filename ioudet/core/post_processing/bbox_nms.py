"""Fixed-shape multiclass NMS (ref: mmdet/core/post_processing/bbox_nms.py
(multiclass_nms)).

The reference loops classes in Python and calls the CUDA NMS per class.  On
TPU we run ONE suppression pass using the standard class-offset trick: each
candidate's box is translated by ``label * (max_coord + 1)`` so boxes of
different classes can never overlap, which makes a single greedy pass exactly
equivalent to per-class NMS.  Candidates are pre-trimmed to a static
``pre_nms_total`` by score (scores below ``score_thr`` are masked first), and
the output is a fixed ``(max_per_img, 5)`` block padded with label -1 —
jit-friendly end to end.

``score_factors`` multiplies class scores before everything (the hook the
reference exposes for FCOS centerness and the fork's IoU rescoring).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..bbox.geometry import bbox_overlaps

NEG_INF = jnp.float32(-1e10)


def _iter_topk(scores: jnp.ndarray, k: int):
    """Exact small-k top-k over the last axis by k iterative argmax passes.

    Bit-identical to ``jax.lax.top_k`` (descending values, ties broken by
    ascending index — argmax returns the FIRST occurrence of the max, and
    masking it out makes the next pass return the next occurrence).  On TPU
    ``top_k`` lowers to a full variadic sort of the (128-lane-padded) class
    axis; for k≪C these k fused max/argmax reduce passes are much cheaper —
    this is the per-anchor ``class_topk`` hot path (N≈5000 rows, C=80, k=4
    in the production config).
    """
    c = scores.shape[-1]
    ar = jnp.arange(c, dtype=jnp.int32)
    s = scores
    vals, idxs = [], []
    for _ in range(k):
        ix = jnp.argmax(s, axis=-1).astype(jnp.int32)
        vals.append(jnp.take_along_axis(s, ix[..., None], axis=-1)[..., 0])
        idxs.append(ix)
        s = jnp.where(ar == ix[..., None], NEG_INF, s)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _threshold_topk(gated: jnp.ndarray, k: int):
    """Exact top-k over a 1-D NONNEGATIVE f32 vector without sorting it.

    ``lax.top_k`` on TPU sorts all M elements (M≈20k per image at the
    production decode) to return k≈2k — the single most expensive non-conv
    op in the eval program.  This computes the same (values, indices) —
    bit-identical, including the ties-by-ascending-index rule — in three
    cheap fixed-shape stages:

      1. binary-search the k-th largest value on the f32 BIT PATTERN
         (nonnegative floats order identically to their int32 bits): 31
         unrolled compare+count reduce passes over M elements;
      2. select the strict-greater survivors plus enough threshold-ties (in
         index order, matching top_k's tie rule) via one cumsum + scatter
         compaction to a static k;
      3. sort only the k survivors (descending value, ascending index) with
         a 2-key ``lax.sort``.

    Caller must guarantee ``gated >= 0`` (the NMS candidate scores are
    gated with ``where(ok, s, 0)`` over sigmoid/softmax scores).
    """
    m = gated.shape[0]
    bits = jax.lax.bitcast_convert_type(gated.astype(jnp.float32), jnp.int32)
    # t = max{v : count(bits >= v) >= k}; domain [0, 0x7F800000] (+inf)
    lo = jnp.int32(0)
    hi = jnp.int32(0x7F800000)
    for _ in range(31):
        mid = lo + (hi - lo + 1) // 2
        ge = jnp.sum((bits >= mid).astype(jnp.int32)) >= k
        lo = jnp.where(ge, mid, lo)
        hi = jnp.where(ge, hi, mid - 1)
    t = lo
    strict = bits > t
    n_strict = jnp.sum(strict.astype(jnp.int32))
    tie = bits == t
    tie_rank = jnp.cumsum(tie.astype(jnp.int32))
    sel = strict | (tie & (tie_rank <= k - n_strict))
    pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
    idx_sel = jnp.zeros((k,), jnp.int32).at[
        jnp.where(sel, pos, k)].set(jnp.arange(m, dtype=jnp.int32),
                                    mode="drop")
    bits_sel = bits[idx_sel]
    _, idx_sorted = jax.lax.sort((jnp.negative(bits_sel), idx_sel),
                                 num_keys=2)
    return gated[idx_sorted], idx_sorted


@partial(jax.jit, static_argnames=("score_thr", "iou_thr", "max_per_img",
                                   "pre_nms_total", "nms_type", "class_topk",
                                   "approx_topk", "exact_select"))
def multiclass_nms(multi_bboxes: jnp.ndarray,
                   multi_scores: jnp.ndarray,
                   score_thr: float,
                   iou_thr: float = 0.5,
                   max_per_img: int = 100,
                   score_factors: Optional[jnp.ndarray] = None,
                   valid: Optional[jnp.ndarray] = None,
                   pre_nms_total: int = 2000,
                   nms_type: str = "nms",
                   class_topk: Optional[int] = None,
                   approx_topk: bool = False,
                   exact_select: str = "sort"
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Args:
        multi_bboxes: (N, 4) class-agnostic or (N, C*4) per-class boxes.
        multi_scores: (N, C) foreground class scores (sigmoid, no bg column).
        score_factors: optional (N,) multiplier.
        valid: optional (N,) candidate mask (fixed-shape padding).
        nms_type: 'nms' (exact greedy) | 'matrix' (parallel soft, fast path).
        class_topk: keep only each anchor's top-k classes before the global
            candidate selection (None = exact, all N*C compete).  Sorting the
            full N*C flat score vector is the NMS bottleneck on TPU (~9 ms at
            batch 16); pruning to k<<C classes per anchor cuts it ~10x.  An
            anchor's (k+1)-th class entering the final top-100 is vanishingly
            rare (standard TensorRT BatchedNMS-style optimization).
        exact_select: selection-algorithm switch, all modes BIT-IDENTICAL
            (asserted in tests/test_nms_select.py).  'sort' (default) uses
            ``lax.top_k`` for both selections — measured FASTEST on v5e
            (79.3 ms full program vs 83.9 for 'threshold', same-day A/B,
            docs/MODEL_ZOO.md round-5 probes: XLA's tuned sort beats the
            31-pass binary search's serial latency).  'threshold' routes
            both stages through the sort-free forms (iterative argmax for
            class_topk, binary-search threshold + compaction for the flat
            stage); 'iter_cls' / 'thresh_flat' switch each stage
            individually for A/B attribution.  Negative result kept
            opt-in for future-toolchain re-runs.

    Returns:
        dets: (max_per_img, 5) [x1, y1, x2, y2, score], zero-padded.
        labels: (max_per_img,) int32 0-based class, -1 for padding.
    """
    # local import: ops.nms imports core.bbox.geometry, whose package init
    # imports this module — deferring breaks the cycle
    from ...ops.nms import greedy_suppress, matrix_nms, soft_nms

    n, num_classes = multi_scores.shape
    scores = multi_scores
    if score_factors is not None:
        scores = scores * score_factors[:, None]
    if valid is not None:
        scores = jnp.where(valid[:, None], scores, 0.0)

    # Boxes are NEVER materialized per (anchor, class): only the k
    # pre_nms_total survivors are gathered, directly from the (N, 4) or
    # (N, C, 4) source — the old path built a (N*C, 4) (or class_topk-
    # gathered (N, k, 4)) intermediate, ~6.4 MB/image of pure HBM traffic
    # at the production decode.
    per_class_boxes = multi_bboxes.shape[-1] != 4
    if class_topk is not None and class_topk < num_classes:
        # per-anchor class pruning over the class axis
        if approx_topk:
            cls_scores, cls_idx = jax.lax.approx_max_k(scores, class_topk)
            cls_idx = cls_idx.astype(jnp.int32)
        elif exact_select in ("threshold", "iter_cls"):
            cls_scores, cls_idx = _iter_topk(scores, class_topk)  # (N, k)
        else:
            cls_scores, cls_idx = jax.lax.top_k(scores, class_topk)
        flat_scores = cls_scores.reshape(-1)                     # (N*k,)
        flat_labels = cls_idx.reshape(-1).astype(jnp.int32)
        sel_div = class_topk
    else:
        flat_scores = scores.reshape(-1)                       # (N*C,)
        flat_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))
        sel_div = num_classes
    ok = flat_scores > score_thr

    k = min(pre_nms_total, flat_scores.shape[0])
    gated = jnp.where(ok, flat_scores, 0.0)
    if approx_topk and flat_scores.shape[0] > k:
        top_scores, top_idx = jax.lax.approx_max_k(gated, k)
        top_idx = top_idx.astype(jnp.int32)
    elif exact_select in ("threshold", "thresh_flat") and score_thr >= 0:
        # gated >= 0 holds (scores below a nonnegative score_thr are zeroed)
        top_scores, top_idx = _threshold_topk(gated, k)
    else:
        top_scores, top_idx = jax.lax.top_k(gated, k)
    anchor_idx = top_idx // sel_div
    top_labels = flat_labels[top_idx]
    if per_class_boxes:
        box_idx = anchor_idx * num_classes + top_labels
        top_boxes = multi_bboxes.reshape(n * num_classes, 4)[box_idx]
    else:
        top_boxes = multi_bboxes[anchor_idx]
    top_valid = top_scores > score_thr

    # class offset: boxes of different classes can never overlap
    max_coord = jnp.max(jnp.where(top_valid[:, None], top_boxes, 0.0)) + 1.0
    offs_boxes = top_boxes + top_labels.astype(jnp.float32)[:, None] * max_coord

    if nms_type == "matrix":
        kept_scores = matrix_nms(offs_boxes, jnp.where(top_valid, top_scores, 0.0))
    elif nms_type in ("soft_nms", "soft_nms_linear"):
        method = "gaussian" if nms_type == "soft_nms" else "linear"
        dets_s, keep_s, order_s = soft_nms(
            offs_boxes, jnp.where(top_valid, top_scores, 0.0),
            iou_thr=iou_thr, method=method, min_score=score_thr)
        # scatter decayed scores back to input order
        kept_scores = jnp.zeros_like(top_scores)
        safe = jnp.clip(order_s, 0, top_scores.shape[0] - 1)
        kept_scores = kept_scores.at[safe].set(
            jnp.where(keep_s, dets_s[:, 4], 0.0))
    elif nms_type == "pallas_greedy":
        # single-kernel VMEM-resident greedy (ops.nms_pallas): bit-identical
        # to the default path but LATENCY-BOUND by its sequential inner loop
        # — measured 11.1 ms vs 7.1 ms for the XLA fixed-point at N=2000
        # batch 16 on v5e, so it is opt-in, not the default
        from ...ops.nms_pallas import greedy_keep_pallas
        keep = greedy_keep_pallas(offs_boxes, top_valid, iou_thr)
        kept_scores = jnp.where(keep, top_scores, 0.0)
    else:
        # top_k output is already score-descending -> greedy pass directly.
        # The Jacobi fixed-point sweep converges in ~chain-depth iterations
        # and beat the pallas sequential kernel on the real chip (above).
        iou = bbox_overlaps(offs_boxes, offs_boxes)
        keep = greedy_suppress(iou, top_valid, iou_thr)
        kept_scores = jnp.where(keep, top_scores, 0.0)

    k_out = min(max_per_img, kept_scores.shape[0])
    final_scores, keep_idx = jax.lax.top_k(kept_scores, k_out)
    final_valid = final_scores > score_thr

    dets = jnp.concatenate(
        [top_boxes[keep_idx], final_scores[:, None]], axis=-1)
    dets = dets * final_valid[:, None].astype(dets.dtype)
    labels = jnp.where(final_valid, top_labels[keep_idx], -1)
    if k_out < max_per_img:
        pad = max_per_img - k_out
        dets = jnp.pad(dets, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=-1)
    return dets, labels
