"""Fixed-shape anchor target computation.

Capability twin of the reference's target pipeline (ref:
mmdet/core/anchor/anchor_target.py (anchor_target, anchor_target_single,
anchor_inside_flags, unmap, images_to_levels)) redesigned for XLA: the
reference filters anchors with ``valid_flags`` + ``nonzero`` and "unmaps"
back; here every anchor keeps its slot and exclusion is expressed with
weights, so one compiled program covers every image.

Per image:
  inside = valid_flags [& border check]           (A,)
  assign = MaxIoUAssigner over masked (G, A) IoU
  pos/neg masks via PseudoSampler
  bbox_targets = bbox2delta(anchors, gt[assigned]) on positives
  labels[pos] = gt_label (1-based); label_weights = pos|neg (1.0)

Batched via vmap; ``num_total_pos`` is the focal/reg ``avg_factor``
(RetinaNet: sampling=False -> normalize by positives only).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..bbox.assigners import MaxIoUAssigner
from ..bbox.geometry import take_small
from ..bbox.transforms import bbox2delta


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray          # (B, A) int32; 0 = bg, 1..C fg
    label_weights: jnp.ndarray   # (B, A) float32
    bbox_targets: jnp.ndarray    # (B, A, 4) float32
    bbox_weights: jnp.ndarray    # (B, A, 4) float32
    pos_gt_boxes: jnp.ndarray    # (B, A, 4) gt box assigned to each positive
    num_total_pos: jnp.ndarray   # () int32
    num_total_neg: jnp.ndarray   # () int32


def anchor_inside_flags(flat_anchors: jnp.ndarray, valid_flags: jnp.ndarray,
                        img_shape, allowed_border: int = -1) -> jnp.ndarray:
    """ref: mmdet/core/anchor/anchor_target.py (anchor_inside_flags)."""
    if allowed_border < 0:
        return valid_flags
    h, w = img_shape[0], img_shape[1]
    inside = ((flat_anchors[:, 0] >= -allowed_border) &
              (flat_anchors[:, 1] >= -allowed_border) &
              (flat_anchors[:, 2] < w + allowed_border) &
              (flat_anchors[:, 3] < h + allowed_border))
    return valid_flags & inside


def anchor_target_single(flat_anchors: jnp.ndarray,
                         valid_flags: jnp.ndarray,
                         gt_bboxes: jnp.ndarray,
                         gt_valid: jnp.ndarray,
                         gt_labels: jnp.ndarray,
                         img_shape,
                         assigner: MaxIoUAssigner,
                         target_means: Sequence[float],
                         target_stds: Sequence[float],
                         allowed_border: int = -1,
                         pos_weight: float = -1.0,
                         gt_bboxes_ignore: Optional[jnp.ndarray] = None,
                         gt_ignore_valid: Optional[jnp.ndarray] = None,
                         sampler=None,
                         rng=None):
    A = flat_anchors.shape[0]
    inside = anchor_inside_flags(flat_anchors, valid_flags, img_shape, allowed_border)
    # gt_labels=None: the label lookup is fused with the matched-box lookup
    # below (one (A, G) one-hot matmul against a (G, 5) table instead of
    # two separate ones — each costs ~27 MB of one-hot traffic per image)
    assign = assigner.assign(flat_anchors, gt_bboxes, gt_valid, inside, None,
                             gt_bboxes_ignore, gt_ignore_valid)
    if sampler is not None:
        # sampling=True path (ref: anchor_target_single -> assign_and_sample):
        # only the sampled subset carries loss weight; everything else is
        # excluded exactly like the reference's index-gathered sample sets.
        masks = sampler.sample(assign, rng)
        pos = masks.pos_mask
        neg = masks.neg_mask
    else:
        pos = assign.gt_inds > 0
        neg = assign.gt_inds == 0

    G = gt_bboxes.shape[0]
    safe_gt = jnp.clip(assign.gt_inds - 1, 0, G - 1)
    # ONE one-hot matmul against the (G, 5) [box | label] table, not
    # gt_bboxes[safe_gt] + gt_labels[safe_gt]: the small-table gather costs
    # ~8 ms at A=210k on v5e (see core/bbox/geometry.take_small), and the
    # fused table halves the one-hot traffic vs two separate lookups
    table = jnp.concatenate(
        [gt_bboxes.astype(jnp.float32),
         gt_labels.astype(jnp.float32)[:, None]], axis=-1)   # (G, 5)
    fetched = take_small(table, safe_gt)                      # (A, 5)
    matched_gt = fetched[:, :4]
    deltas = bbox2delta(flat_anchors, matched_gt, target_means, target_stds)
    posf = pos.astype(jnp.float32)
    bbox_targets = deltas * posf[:, None]
    bbox_weights = jnp.broadcast_to(posf[:, None], (A, 4))
    pos_gt_boxes = matched_gt * posf[:, None]

    labels = jnp.where(pos, jnp.round(fetched[:, 4]), 0).astype(jnp.int32)
    pw = 1.0 if pos_weight <= 0 else float(pos_weight)
    label_weights = posf * pw + neg.astype(jnp.float32)
    return labels, label_weights, bbox_targets, bbox_weights, pos_gt_boxes, \
        jnp.sum(pos), jnp.sum(neg)


def anchor_target(flat_anchors: jnp.ndarray,
                  valid_flags: jnp.ndarray,
                  gt_bboxes: jnp.ndarray,
                  gt_valid: jnp.ndarray,
                  gt_labels: jnp.ndarray,
                  img_shapes: jnp.ndarray,
                  assigner: MaxIoUAssigner,
                  target_means: Sequence[float] = (0., 0., 0., 0.),
                  target_stds: Sequence[float] = (1., 1., 1., 1.),
                  allowed_border: int = -1,
                  pos_weight: float = -1.0,
                  sampler=None,
                  rng=None,
                  gt_bboxes_ignore=None,
                  gt_ignore_valid=None) -> AnchorTargets:
    """Batched targets.

    flat_anchors: (A, 4) all-level concat (shared across images).
    valid_flags: (B, A) bool per image.
    gt_bboxes: (B, G, 4); gt_valid: (B, G); gt_labels: (B, G) 1-based.
    img_shapes: (B, 2) per-image (h, w) actual content shape.
    sampler/rng: when given, per-image anchor subsampling (RPN's
    RandomSampler 256 @ 0.5 — the reference's sampling=True path).
    gt_bboxes_ignore/gt_ignore_valid: (B, I, 4)/(B, I) crowd/ignore regions;
    anchors overlapping them above the assigner's ignore_iof_thr are
    excluded from the loss entirely.
    """
    B = valid_flags.shape[0]
    if (sampler is None and gt_bboxes_ignore is None and allowed_border < 0
            and type(assigner) is MaxIoUAssigner
            and assigner.gt_max_assign_all
            and assigner.ignore_iof_thr <= 0
            and gt_valid.shape[1] <= 128):
        # fused Pallas path for the default (focal-family) configuration —
        # one in-register sweep instead of (G, A) matrix materializations;
        # exact-equality-tested vs the XLA path (tests/test_assign_pallas.py)
        from ...ops.assign_pallas import fused_anchor_assign
        pw = 1.0 if pos_weight <= 0 else float(pos_weight)
        labels, lw, posf, bt, pgb = fused_anchor_assign(
            flat_anchors, valid_flags, gt_bboxes, gt_valid, gt_labels,
            pos_iou_thr=float(assigner.pos_iou_thr),
            neg_iou_thr=float(assigner.neg_iou_thr),
            min_pos_iou=float(assigner.min_pos_iou), pos_weight=pw,
            target_means=tuple(target_means), target_stds=tuple(target_stds))
        A = flat_anchors.shape[0]
        bw = jnp.broadcast_to(posf[..., None], (B, A, 4))
        npos = jnp.sum(posf).astype(jnp.int32)
        nneg = jnp.round(jnp.sum(lw - posf * pw)).astype(jnp.int32)
        return AnchorTargets(labels, lw, bt, bw, pgb, npos, nneg)

    keys = (jax.random.split(rng, B) if sampler is not None
            else jnp.zeros((B, 2), jnp.uint32))

    if gt_bboxes_ignore is not None:
        def single(vf, gb, gv, gl, shape, key, gbi, giv):
            return anchor_target_single(
                flat_anchors, vf, gb, gv, gl, shape, assigner,
                target_means, target_stds, allowed_border, pos_weight,
                gt_bboxes_ignore=gbi, gt_ignore_valid=giv,
                sampler=sampler, rng=key)

        labels, lw, bt, bw, pgb, npos, nneg = jax.vmap(single)(
            valid_flags, gt_bboxes, gt_valid, gt_labels, img_shapes, keys,
            gt_bboxes_ignore, gt_ignore_valid)
        return AnchorTargets(labels, lw, bt, bw, pgb,
                             jnp.sum(npos).astype(jnp.int32),
                             jnp.sum(nneg).astype(jnp.int32))

    def single(vf, gb, gv, gl, shape, key):
        return anchor_target_single(
            flat_anchors, vf, gb, gv, gl, shape, assigner,
            target_means, target_stds, allowed_border, pos_weight,
            sampler=sampler, rng=key)

    labels, lw, bt, bw, pgb, npos, nneg = jax.vmap(single)(
        valid_flags, gt_bboxes, gt_valid, gt_labels, img_shapes, keys)
    return AnchorTargets(labels, lw, bt, bw, pgb,
                         jnp.sum(npos).astype(jnp.int32),
                         jnp.sum(nneg).astype(jnp.int32))


def images_to_levels(target: jnp.ndarray, num_level_anchors: Sequence[int]):
    """Split an all-level (B, A, ...) tensor back into per-level list
    (ref: images_to_levels) — static split points, so jit-safe."""
    out, start = [], 0
    for n in num_level_anchors:
        out.append(target[:, start:start + n])
        start += n
    return out
