"""Fixed-shape max-IoU target assignment.

Re-implements the reference's assignment semantics (ref:
mmdet/core/bbox/assigners/max_iou_assigner.py (MaxIoUAssigner.assign,
.assign_wrt_overlaps)) without ``nonzero``/boolean indexing so the whole
thing jits with static shapes:

  1. all anchors start as ignore (-1);
  2. anchors whose best IoU is in ``[0, neg_iou_thr)`` become background (0);
  3. anchors whose best IoU >= ``pos_iou_thr`` get that gt (index+1);
  4. sequentially over gts: every anchor tying the gt's max IoU
     (``gt_max_assign_all``) is forced positive for that gt when the max is
     >= ``min_pos_iou`` — later gts overwrite earlier ones, matching the
     reference's Python loop order;
  5. optional ignore regions: anchors with IoF > ``ignore_iof_thr`` against
     any ignore box are reset to -1.

Padded (invalid) gts and invalid anchors are handled by masking their
overlaps to -1 before any max, which reproduces "they were never there".
RetinaNet config: pos 0.5 / neg 0.4 / min_pos_iou 0 / ignore_iof_thr -1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .geometry import bbox_overlaps, take_small


class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray       # (A,) int32 in {-1, 0, 1..G}
    max_overlaps: jnp.ndarray  # (A,) float32 (masked entries = -1)
    labels: jnp.ndarray        # (A,) int32 category of assigned gt (0 if none)


def assign_max_iou(overlaps: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   anchor_valid: jnp.ndarray,
                   gt_labels: Optional[jnp.ndarray] = None,
                   pos_iou_thr: float = 0.5,
                   neg_iou_thr: float = 0.4,
                   min_pos_iou: float = 0.0,
                   gt_max_assign_all: bool = True) -> AssignResult:
    """Assign from a precomputed (G, A) overlap matrix (gt-major, like the ref).

    gt_valid: (G,) bool — False rows are padding.
    anchor_valid: (A,) bool — False anchors excluded entirely.
    gt_labels: (G,) int32 1-based category ids (optional).
    """
    overlaps = jnp.asarray(overlaps)
    gt_valid = jnp.asarray(gt_valid)
    anchor_valid = jnp.asarray(anchor_valid)
    if gt_labels is not None:
        gt_labels = jnp.asarray(gt_labels)
    G, A = overlaps.shape
    neg_inf = jnp.float32(-1.0)
    masked = jnp.where(gt_valid[:, None] & anchor_valid[None, :], overlaps, neg_inf)

    max_overlaps = jnp.max(masked, axis=0)          # (A,)
    argmax_overlaps = jnp.argmax(masked, axis=0)    # (A,)
    gt_max_overlaps = jnp.max(masked, axis=1)       # (G,)

    assigned = jnp.full((A,), -1, dtype=jnp.int32)
    assigned = jnp.where((max_overlaps >= 0) & (max_overlaps < neg_iou_thr),
                         0, assigned)
    assigned = jnp.where(max_overlaps >= pos_iou_thr,
                         argmax_overlaps.astype(jnp.int32) + 1, assigned)

    # step 4: force each gt's best anchor(s) positive.  The reference's
    # sequential later-wins loop == "the HIGHEST gt index whose best-anchor
    # set contains this anchor", so one (G, A) max replaces the G-step
    # fori_loop (a 32-iteration serial chain of (A,)-sized kernels on TPU).
    ok = gt_valid & (gt_max_overlaps >= min_pos_iou)          # (G,)
    if gt_max_assign_all:
        hit = masked == gt_max_overlaps[:, None]
    else:
        row_best = jnp.argmax(masked, axis=1)                 # (G,)
        hit = jax.lax.broadcasted_iota(jnp.int32, (G, A), 1) \
            == row_best[:, None]
    hit = hit & ok[:, None] & anchor_valid[None, :]
    forced = jnp.max(
        jnp.where(hit, jnp.arange(1, G + 1, dtype=jnp.int32)[:, None], 0),
        axis=0)                                               # (A,)
    assigned = jnp.where(forced > 0, forced, assigned)

    if gt_labels is not None:
        safe = jnp.clip(assigned - 1, 0, G - 1)
        # one-hot matmul, not gt_labels[safe]: small-table gather is ~8 ms
        # on v5e at A=210k (see geometry.take_small)
        labels = jnp.where(assigned > 0, take_small(gt_labels, safe),
                           0).astype(jnp.int32)
    else:
        labels = jnp.zeros((A,), dtype=jnp.int32)
    return AssignResult(assigned, max_overlaps, labels)


class MaxIoUAssigner:
    """Config-facing wrapper computing overlaps then delegating to
    :func:`assign_max_iou`.  Signature mirrors the reference class."""

    def __init__(self, pos_iou_thr: float, neg_iou_thr: float,
                 min_pos_iou: float = 0.0, gt_max_assign_all: bool = True,
                 ignore_iof_thr: float = -1.0):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.ignore_iof_thr = ignore_iof_thr

    def assign(self, bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
               gt_valid: jnp.ndarray, anchor_valid: jnp.ndarray,
               gt_labels: Optional[jnp.ndarray] = None,
               gt_bboxes_ignore: Optional[jnp.ndarray] = None,
               gt_ignore_valid: Optional[jnp.ndarray] = None) -> AssignResult:
        overlaps = bbox_overlaps(gt_bboxes, bboxes)  # (G, A), gt-major like ref
        result = assign_max_iou(
            overlaps, gt_valid, anchor_valid, gt_labels,
            pos_iou_thr=self.pos_iou_thr, neg_iou_thr=self.neg_iou_thr,
            min_pos_iou=self.min_pos_iou, gt_max_assign_all=self.gt_max_assign_all)
        if (self.ignore_iof_thr > 0 and gt_bboxes_ignore is not None
                and gt_ignore_valid is not None):
            iof = bbox_overlaps(bboxes, gt_bboxes_ignore, mode="iof")  # (A, Gi)
            iof = jnp.where(gt_ignore_valid[None, :], iof, 0.0)
            hit_ignore = jnp.max(iof, axis=1) > self.ignore_iof_thr
            gt_inds = jnp.where(hit_ignore, -1, result.gt_inds)
            labels = jnp.where(hit_ignore, 0, result.labels)
            result = AssignResult(gt_inds, result.max_overlaps, labels)
        return result


class PointAssigner:
    """Assign points to gt boxes (ref: mmdet/core/bbox/assigners/
    point_assigner.py (PointAssigner.assign) — the RepPoints init-stage
    assigner).

    Reference semantics, fixed-shape: each gt lives on ONE pyramid level
    (``lvl = clamp(round_toward_zero(0.5*(log2(w/scale)+log2(h/scale))))``);
    among that level's points, the gt claims its ``pos_num`` nearest by
    gt-normalized center distance; a point contested by several gts keeps
    the closest one (the reference's sequential loop carries a per-point
    best-distance table — later gts win only by being strictly closer).
    Everything unassigned is background (0); there is no ignore state.
    """

    def __init__(self, scale: float = 4, pos_num: int = 3):
        self.scale = scale
        self.pos_num = pos_num

    def assign(self, points: jnp.ndarray, gt_bboxes: jnp.ndarray,
               gt_valid: jnp.ndarray, point_valid: jnp.ndarray,
               gt_labels: Optional[jnp.ndarray] = None) -> AssignResult:
        """points (P, 3): x, y, stride.  Padded gts masked via gt_valid."""
        points = jnp.asarray(points)
        xy = points[:, :2]
        pts_lvl = jnp.floor(jnp.log2(points[:, 2])).astype(jnp.int32)  # (P,)
        lvl_min, lvl_max = jnp.min(pts_lvl), jnp.max(pts_lvl)

        gt_xy = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) / 2
        gt_wh = jnp.clip(gt_bboxes[:, 2:] - gt_bboxes[:, :2], 1e-6, None)
        # torch .int() truncates toward zero, not floor
        gt_lvl = jnp.clip(
            (0.5 * (jnp.log2(gt_wh[:, 0] / self.scale)
                    + jnp.log2(gt_wh[:, 1] / self.scale))
             ).astype(jnp.int32), lvl_min, lvl_max)                    # (G,)

        G = gt_bboxes.shape[0]
        P = points.shape[0]
        INF = jnp.float32(1e18)

        def body(i, carry):
            assigned, best_dist = carry
            dist = jnp.linalg.norm((xy - gt_xy[i]) / gt_wh[i], axis=1)
            dist = jnp.where((pts_lvl == gt_lvl[i]) & point_valid, dist, INF)
            # gt i's pos_num nearest candidates on its level
            neg_top, top_idx = jax.lax.top_k(-dist, self.pos_num)
            cand_dist = -neg_top
            take = (cand_dist < best_dist[top_idx]) & (cand_dist < INF) \
                & gt_valid[i]
            assigned = assigned.at[top_idx].set(
                jnp.where(take, jnp.int32(i + 1), assigned[top_idx]))
            best_dist = best_dist.at[top_idx].set(
                jnp.where(take, cand_dist, best_dist[top_idx]))
            return assigned, best_dist

        assigned, _ = jax.lax.fori_loop(
            0, G, body, (jnp.zeros((P,), jnp.int32), jnp.full((P,), INF)))

        if gt_labels is not None:
            safe = jnp.clip(assigned - 1, 0, G - 1)
            labels = jnp.where(assigned > 0, take_small(gt_labels, safe),
                               0).astype(jnp.int32)
        else:
            labels = jnp.zeros((P,), jnp.int32)
        return AssignResult(assigned, jnp.zeros((P,), jnp.float32), labels)


class ApproxMaxIoUAssigner(MaxIoUAssigner):
    """Assign via the MAX IoU over each location's approximate anchors
    (ref: mmdet/core/bbox/assigners/approx_max_iou_assigner.py): guided
    anchoring places ``squares`` (one per cell) but judges pos/neg by the
    best of the cell's ``approxs`` (e.g. the 9 RetinaNet anchors).

    Standalone, registry-facing version of the logic embedded in
    GuidedAnchorHead.loss; ``assign_approx`` takes (A, n_approx, 4) approxs
    grouped per square and reduces IoU over the approx axis before the
    standard max-IoU rules."""

    def assign_approx(self, approxs: jnp.ndarray, squares: jnp.ndarray,
                      gt_bboxes: jnp.ndarray, gt_valid: jnp.ndarray,
                      square_valid: jnp.ndarray,
                      gt_labels: Optional[jnp.ndarray] = None,
                      gt_bboxes_ignore: Optional[jnp.ndarray] = None,
                      gt_ignore_valid: Optional[jnp.ndarray] = None
                      ) -> AssignResult:
        A, n_approx = approxs.shape[:2]
        flat = approxs.reshape(A * n_approx, 4)
        overlaps = bbox_overlaps(gt_bboxes, flat)      # (G, A*n)
        overlaps = overlaps.reshape(-1, A, n_approx).max(axis=-1)  # (G, A)
        result = assign_max_iou(
            overlaps, gt_valid, square_valid, gt_labels,
            pos_iou_thr=self.pos_iou_thr, neg_iou_thr=self.neg_iou_thr,
            min_pos_iou=self.min_pos_iou,
            gt_max_assign_all=self.gt_max_assign_all)
        if (self.ignore_iof_thr > 0 and gt_bboxes_ignore is not None
                and gt_ignore_valid is not None):
            iof = bbox_overlaps(squares, gt_bboxes_ignore, mode="iof")
            iof = jnp.where(gt_ignore_valid[None, :], iof, 0.0)
            hit = jnp.max(iof, axis=1) > self.ignore_iof_thr
            result = AssignResult(jnp.where(hit, -1, result.gt_inds),
                                  result.max_overlaps,
                                  jnp.where(hit, 0, result.labels))
        return result
