"""Test-time-augmentation merging (ref: mmdet/core/post_processing/merge_augs.py
(merge_aug_proposals, merge_aug_bboxes, merge_aug_scores, merge_aug_masks)).

Single-stage views produce INDEPENDENT candidate sets, so their boxes are
mapped back to original-image space, concatenated, and a single NMS runs
over the union (the reference's SingleStageDetector.aug_test raised
NotImplementedError at this vintage; we implement the documented merge
semantics so multi-scale TTA works for the single-stage family too).

Two-stage views share ONE merged proposal set (merge_aug_proposals), so
their per-proposal boxes/scores align 1:1 across views and are AVERAGED
after mapping back (merge_aug_bboxes_mean — the reference's
merge_aug_bboxes stacks and means).  Mask probabilities are averaged in the
box frame with flipped views mirrored back first (merge_aug_masks).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..bbox.transforms import bbox_mapping_back


def merge_aug_bboxes(aug_bboxes: Sequence[jnp.ndarray],
                     aug_scores: Sequence[jnp.ndarray],
                     img_metas: Sequence[dict]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map per-view boxes back to original image space and concatenate.

    aug_bboxes: list of (N, 4); aug_scores: list of (N, C);
    img_metas: per view dict with 'img_shape', 'scale_factor', 'flip'.
    """
    recovered = []
    for bboxes, meta in zip(aug_bboxes, img_metas):
        recovered.append(
            bbox_mapping_back(bboxes, meta["img_shape"], meta["scale_factor"],
                              meta["flip"]))
    bboxes = jnp.concatenate(recovered, axis=0)
    scores = jnp.concatenate(list(aug_scores), axis=0)
    return bboxes, scores


def merge_aug_scores(aug_scores: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.mean(jnp.stack(list(aug_scores)), axis=0)


def merge_aug_proposals(aug_proposals: Sequence[jnp.ndarray],
                        img_metas: Sequence[dict],
                        rpn_test_cfg: dict) -> jnp.ndarray:
    """Merge per-view RPN proposals into one fixed-shape set (ref:
    mmdet/core/post_processing/merge_augs.py (merge_aug_proposals)).

    Each view's (P, 5) proposals (in VIEW coordinates, score-padded) are
    mapped back to original-image space, concatenated, suppressed with one
    NMS at the RPN ``nms_thr`` and capped at ``max_num`` by score.  Returns
    (max_num, 5) with zero-score padding — fixed shape end to end.
    """
    from ...ops.nms import nms

    recovered = []
    for props, meta in zip(aug_proposals, img_metas):
        boxes = bbox_mapping_back(props[:, :4], meta["img_shape"],
                                  meta["scale_factor"], meta["flip"])
        recovered.append(jnp.concatenate([boxes, props[:, 4:5]], axis=-1))
    merged = jnp.concatenate(recovered, axis=0)
    valid = merged[:, 4] > 0  # fixed-shape padding slots carry score 0
    dets, keep, _ = nms(merged[:, :4], merged[:, 4],
                        iou_thr=float(rpn_test_cfg.get("nms_thr", 0.7)),
                        valid=valid)
    scores = jnp.where(keep, dets[:, 4], 0.0)
    k = min(int(rpn_test_cfg.get("max_num", 1000)), merged.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    return jnp.concatenate([dets[idx, :4], top_scores[:, None]], axis=-1)


def merge_aug_bboxes_mean(aug_bboxes: Sequence[jnp.ndarray],
                          aug_scores: Sequence[jnp.ndarray],
                          img_metas: Sequence[dict]
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage TTA merge (ref: merge_aug_bboxes): all views refine the
    SAME proposals, so per-proposal boxes align 1:1 across views — map each
    view's boxes back to original-image space, then MEAN boxes and scores
    element-wise (not concat; that is the single-stage merge)."""
    recovered = [
        bbox_mapping_back(b, meta["img_shape"], meta["scale_factor"],
                          meta["flip"])
        for b, meta in zip(aug_bboxes, img_metas)]
    return (jnp.mean(jnp.stack(recovered), axis=0),
            jnp.mean(jnp.stack(list(aug_scores)), axis=0))


def merge_aug_masks(aug_masks: Sequence[jnp.ndarray],
                    img_metas: Sequence[dict],
                    weights: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """Average per-view BOX-FRAME mask probabilities (ref: merge_aug_masks).

    The reference flips the full-image mask of flipped views before
    averaging; with box-frame (N, S, S) crops the equivalent is mirroring
    the crop along its x axis (the box itself was already mapped back
    through bbox_mapping, so frames align across views)."""
    out = []
    for m, meta in zip(aug_masks, img_metas):
        out.append(m[..., ::-1] if meta["flip"] else m)
    if weights is None:
        return jnp.mean(jnp.stack(out), axis=0)
    w = jnp.asarray(list(weights), jnp.float32)
    return jnp.tensordot(w / jnp.sum(w), jnp.stack(out), axes=1)
