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


@partial(jax.jit, static_argnames=("score_thr", "iou_thr", "max_per_img",
                                   "pre_nms_total", "nms_type", "class_topk",
                                   "approx_topk"))
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
                   approx_topk: bool = False
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

    if multi_bboxes.shape[-1] == 4:
        boxes_pc = jnp.broadcast_to(multi_bboxes[:, None, :], (n, num_classes, 4))
    else:
        boxes_pc = multi_bboxes.reshape(n, num_classes, 4)

    if class_topk is not None and class_topk < num_classes:
        # per-anchor class pruning: small-k top_k over the class axis
        if approx_topk:
            cls_scores, cls_idx = jax.lax.approx_max_k(scores, class_topk)
            cls_idx = cls_idx.astype(jnp.int32)
        else:
            cls_scores, cls_idx = jax.lax.top_k(scores, class_topk)  # (N, k)
        flat_scores = cls_scores.reshape(-1)                     # (N*k,)
        flat_labels = cls_idx.reshape(-1).astype(jnp.int32)
        gath = jnp.take_along_axis(boxes_pc, cls_idx[..., None], axis=1)
        flat_boxes = gath.reshape(-1, 4)
    else:
        flat_scores = scores.reshape(-1)                       # (N*C,)
        flat_boxes = boxes_pc.reshape(-1, 4)
        flat_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))
    ok = flat_scores > score_thr

    k = min(pre_nms_total, flat_scores.shape[0])
    gated = jnp.where(ok, flat_scores, 0.0)
    if approx_topk and flat_scores.shape[0] > k:
        top_scores, top_idx = jax.lax.approx_max_k(gated, k)
        top_idx = top_idx.astype(jnp.int32)
    else:
        top_scores, top_idx = jax.lax.top_k(gated, k)
    top_boxes = flat_boxes[top_idx]
    top_labels = flat_labels[top_idx]
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
