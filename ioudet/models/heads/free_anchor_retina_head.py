"""FreeAnchor RetinaNet head (ref: mmdet/models/anchor_heads/
free_anchor_retina_head.py (FreeAnchorRetinaHead), paper NeurIPS'19
"FreeAnchor: Learning to Match Anchors for Visual Object Detection").

Same network as RetinaHead; the loss replaces hard assignment with
maximum-likelihood anchor bags:
  * each gt owns a bag of its top-k (pre_anchor_topk=50) highest-IoU anchors;
  * positive loss: -log(mean-max over the bag of
        P_cls(anchor, gt_label) * P_loc(anchor -> gt))
    where P_loc = exp(-bbox_loss) and mean-max weights bag members by
    1/(1-p) (the paper's soft selection);
  * negative loss: focal-weighted BCE on P_cls * P(anchor not matched to any
    gt), with P{matched} a saturated-linear function of the decoded box's
    IoU to each gt.

Fixed-shape: bags are top-k gathers (static k); padded gts contribute zero
via masks.  Inference is inherited from RetinaHead unchanged.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...core.bbox import bbox_overlaps, bbox2delta, delta2bbox
from ..registry import HEADS
from .retina_head import RetinaHead


@HEADS.register_module
class FreeAnchorRetinaHead(RetinaHead):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5

    def positive_bag_loss(self, matched_prob: jnp.ndarray,
                          bag_valid: jnp.ndarray) -> jnp.ndarray:
        """matched_prob (G, K); mean-max weighting w = 1/(1-p) normalized."""
        p = jnp.clip(matched_prob, 0.0, 1.0 - 1e-6) * bag_valid
        w = 1.0 / jnp.clip(1.0 - p, 1e-12, None) * bag_valid
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
        bag_prob = jnp.sum(w * p, axis=-1)  # (G,)
        return -jnp.log(jnp.clip(bag_prob, 1e-12, None))  # (G,)

    def negative_bag_loss(self, cls_prob: jnp.ndarray,
                          box_prob: jnp.ndarray) -> jnp.ndarray:
        """focal-weighted BCE on P_cls * (1 - P_matched)."""
        prob = cls_prob * (1.0 - box_prob)
        prob = jnp.clip(prob, 1e-12, 1.0 - 1e-12)
        return prob ** self.gamma * (-jnp.log(1.0 - prob))

    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_labels, gt_valid,
             img_shapes, pad_shapes, train_cfg) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        gens = self.anchor_generators()
        anchors = jnp.concatenate(
            [g.grid_anchors(fs, s) for g, fs, s in
             zip(gens, featmap_sizes, self.anchor_strides)], axis=0)  # (A, 4)
        B = cls_scores[0].shape[0]
        A = anchors.shape[0]
        K = self.pre_anchor_topk
        C = self.cls_out_channels

        cls_flat = self._flatten_levels(cls_scores, C)          # (B, A, C)
        box_flat = self._flatten_levels(bbox_preds, 4)          # (B, A, 4)

        def single(cls_i, box_i, gb, gv, gl):
            cls_prob = jax.nn.sigmoid(cls_i)                     # (A, C)
            decoded = delta2bbox(anchors, box_i, self.target_means,
                                 self.target_stds)               # (A, 4)
            # ---- box_prob: P{anchor matched to some gt} for the negatives
            obj_iou = bbox_overlaps(gb, decoded)                 # (G, A)
            t1 = self.bbox_thr
            t2 = jnp.clip(jnp.max(obj_iou, axis=-1, keepdims=True),
                          t1 + 1e-12, None)                      # per-gt max
            obj_prob = jnp.clip((obj_iou - t1) / (t2 - t1), 0.0, 1.0)
            obj_prob = obj_prob * gv[:, None]
            # scatter per-class: P(a matched with class c) = max over gts of c
            onehot = jax.nn.one_hot(gl - 1, C) * gv[:, None]     # (G, C)
            box_prob = jnp.max(obj_prob[:, :, None] * onehot[:, None, :],
                               axis=0)                           # (A, C)

            # ---- positive bags: top-K anchors per gt by anchor-gt IoU
            anchor_iou = bbox_overlaps(gb, anchors)              # (G, A)
            _, bag_idx = jax.lax.top_k(anchor_iou, K)            # (G, K)
            safe_lab = jnp.clip(gl - 1, 0, C - 1)
            cls_bag = cls_prob[bag_idx, safe_lab[:, None]]       # (G, K)
            pred_bag = box_i[bag_idx]                            # (G, K, 4)
            anc_bag = anchors[bag_idx]
            target_deltas = bbox2delta(anc_bag, gb[:, None, :].repeat(K, 1),
                                       self.target_means, self.target_stds)
            # P_loc = exp(-smoothL1 * reg_weight) (ref uses loss_bbox weight)
            diff = jnp.abs(pred_bag - target_deltas)
            beta = 0.11
            sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                            diff - 0.5 * beta).sum(-1)           # (G, K)
            loc_prob = jnp.exp(-sl1 * 2.0)
            matched = cls_bag * loc_prob
            bag_valid = jnp.broadcast_to(gv[:, None], (gv.shape[0], K))
            pos = jnp.sum(self.positive_bag_loss(matched, bag_valid) * gv)

            neg = jnp.sum(self.negative_bag_loss(cls_prob, box_prob))
            num_pos = jnp.maximum(jnp.sum(gv), 1.0)
            return pos, neg, num_pos

        pos, neg, num_pos = jax.vmap(single)(cls_flat, box_flat, gt_bboxes,
                                             gt_valid, gt_labels)
        total_pos = jnp.maximum(jnp.sum(num_pos), 1.0)
        loss_pos = self.alpha * jnp.sum(pos) / total_pos
        loss_neg = (1 - self.alpha) * jnp.sum(neg) / (total_pos * K)
        return dict(loss_cls=loss_pos, loss_bbox=loss_neg)
