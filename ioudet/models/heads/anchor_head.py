"""Anchor-based detection head base (ref: mmdet/models/anchor_heads/
anchor_head.py (AnchorHead.forward, get_anchors, loss, loss_single,
get_bboxes, get_bboxes_single) — the single most behavior-critical file of
the reference).

TPU-native redesign:
  * ``__call__`` (flax) produces per-level conv outputs in NHWC; channel
    layout is anchor-major (a*C + c), matching the location-major /
    anchor-fastest flattening of ``AnchorGenerator.grid_anchors``.
  * ``loss`` runs on level-concatenated tensors instead of the reference's
    per-level ``multi_apply`` — mathematically identical (same avg_factor,
    sum over levels) and one big fused kernel instead of 5 small ones.
  * ``get_bboxes`` is fully batched and fixed-shape: per-level top-k
    (nms_pre) instead of threshold-filter, masked instead of gathered,
    single batched multiclass NMS — one XLA program, no host round trips.
  * target assignment uses the fixed-shape ``anchor_target`` (masks, no
    nonzero).

Anchors/valid-flags depend only on static feature shapes + traced per-image
pad shapes, so everything jits once per canvas.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchor import AnchorGenerator, anchor_target
from ...core.bbox import MaxIoUAssigner, delta2bbox
from ...core.post_processing import multiclass_nms
from ..registry import HEADS, LOSSES
from ...utils.registry import build_from_cfg

_CONV_INIT = nn.initializers.normal(0.01)


def build_loss(cfg: dict):
    # None-valued keys delete inherited config entries (same convention as
    # the model builder)
    cfg = {k: v for k, v in cfg.items() if v is not None or k == "type"}
    return build_from_cfg(cfg, LOSSES)


@HEADS.register_module
class AnchorHead(nn.Module):
    """Single shared conv per branch (the RPN-ish base).  Subclasses override
    the network part; loss/get_bboxes are inherited."""

    num_classes: int = 81                       # incl. background (ref convention)
    in_channels: int = 256
    feat_channels: int = 256
    anchor_scales: Tuple[float, ...] = (8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_base_sizes: Optional[Tuple[int, ...]] = None
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    use_sigmoid_cls: bool = True
    loss_cls: Any = None                        # config dict
    loss_bbox: Any = None
    dtype: Any = jnp.float32

    # ---------------- configuration helpers (host-side, no params) --------

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes - 1 if self.use_sigmoid_cls else self.num_classes

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_ratios) * len(self.anchor_scales)

    def anchor_generators(self) -> List[AnchorGenerator]:
        bases = self.anchor_base_sizes or self.anchor_strides
        return [AnchorGenerator(b, self.anchor_scales, self.anchor_ratios)
                for b in bases]

    def _loss_cls_fn(self):
        cfg = self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                    gamma=2.0, alpha=0.25, loss_weight=1.0)
        return build_loss(dict(cfg))

    def _loss_bbox_fn(self):
        cfg = self.loss_bbox or dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                                     loss_weight=1.0)
        return build_loss(dict(cfg))

    # ---------------- network ---------------------------------------------

    @nn.compact
    def __call__(self, feats, train: bool = False):
        conv_cls = nn.Conv(self.num_anchors * self.cls_out_channels, (1, 1),
                           kernel_init=_CONV_INIT, dtype=self.dtype, name="conv_cls")
        conv_reg = nn.Conv(self.num_anchors * 4, (1, 1),
                           kernel_init=_CONV_INIT, dtype=self.dtype, name="conv_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            cls_scores.append(conv_cls(x))
            bbox_preds.append(conv_reg(x))
        return cls_scores, bbox_preds

    # ---------------- anchors ---------------------------------------------

    def get_anchors(self, featmap_sizes: Sequence[Tuple[int, int]],
                    pad_shapes: jnp.ndarray):
        """Returns (flat_anchors (A_tot, 4), valid (B, A_tot)).

        featmap_sizes: static per-level (H, W).
        pad_shapes: (B, 2) traced per-image padded content shape.
        """
        gens = self.anchor_generators()
        anchors = jnp.concatenate(
            [g.grid_anchors(fs, s) for g, fs, s in
             zip(gens, featmap_sizes, self.anchor_strides)], axis=0)

        def per_image(shape):
            flags = []
            for g, fs, s in zip(gens, featmap_sizes, self.anchor_strides):
                vh = jnp.minimum(jnp.ceil(shape[0] / s).astype(jnp.int32), fs[0])
                vw = jnp.minimum(jnp.ceil(shape[1] / s).astype(jnp.int32), fs[1])
                flags.append(g.valid_flags(fs, (vh, vw)))
            return jnp.concatenate(flags)

        valid = jax.vmap(per_image)(pad_shapes)
        return anchors, valid

    def _flatten_levels(self, preds: Sequence[jnp.ndarray], ch: int) -> jnp.ndarray:
        """(B, H, W, A*ch) per level -> (B, A_tot, ch), matching anchor order."""
        flat = []
        for p in preds:
            b, h, w, _ = p.shape
            flat.append(p.reshape(b, h * w * self.num_anchors, ch))
        return jnp.concatenate(flat, axis=1)

    def _cls_loss_from_levels(self, cls_scores, labels, label_weights,
                              avg_factor):
        """Classification loss consuming per-level conv outputs IN PLACE.

        The flatten+concat path materializes a (B, A_tot, C) logits copy
        (b8/C=80 at 832x1344: ~540 MB of HBM traffic per step) purely to
        re-order anchors; for an elementwise loss the anchor sum is
        order-independent, so each level's (B, H, W, A*C) tensor can be
        consumed where the conv produced it.  Measured on v5e: 58.0 ->
        53.3 ms fwd-only @ b8 (flatten+focal vs per-level focal); a fused
        shared-exp focal variant measured the same 53.3 ms, so the layout
        (not the transcendentals) is the whole win.

        Fast path only for sigmoid FocalLoss (the retina family's loss —
        elementwise over a one-hot target built inline from the flat
        (B, A_tot) labels, ref: mmdet/models/losses/focal_loss.py
        (py_sigmoid_focal_loss)); anything else falls back to the flat
        layout, which non-elementwise losses (GHMC bins, softmax CE rows)
        need anyway.
        """
        cfg = dict(self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                         gamma=2.0, alpha=0.25,
                                         loss_weight=1.0))
        C = self.cls_out_channels
        if not (cfg.get("type") == "FocalLoss"
                and cfg.get("use_sigmoid", True)
                and cfg.get("reduction", "mean") == "mean"):
            cls_flat = self._flatten_levels(cls_scores, C)
            return self._call_loss(
                self._loss_cls_fn(), "cls_acc_sum",
                cls_flat.reshape(-1, C), labels.reshape(-1),
                weight=label_weights.reshape(-1), avg_factor=avg_factor)

        from ..losses.focal_loss import fused_level_focal_sum
        gamma = cfg.get("gamma", 2.0)
        alpha = cfg.get("alpha", 0.25)
        A = self.num_anchors
        total = jnp.float32(0.0)
        start = 0
        for p in cls_scores:
            b, h, w, _ = p.shape
            n = h * w * A
            # fused weighted sum: one-hot target + focal + weight + reduce in
            # one pass, target rebuilt from int labels in fwd AND bwd — no
            # (B,H,W,A*C) target/loss/weight tensor ever hits HBM (the
            # round-3 in-place win, extended through the backward)
            total = total + fused_level_focal_sum(
                p, labels[:, start:start + n],
                label_weights[:, start:start + n].astype(jnp.float32),
                gamma, alpha, A)
            start += n
        return cfg.get("loss_weight", 1.0) * total / jnp.maximum(
            avg_factor, 1e-12)

    # ---------------- training loss ----------------------------------------

    def _call_loss(self, fn, state_name: str, *args, **kwargs):
        """Invoke a loss fn, threading EMA bin-count state for stateful GHM
        losses (ref: mmdet/models/losses/ghm_loss.py — ``self.acc_sum`` is a
        torch-module buffer mutated per forward; the flax analog is a 'ghm'
        mutable collection carried in the train state)."""
        if not getattr(fn, "stateful", False):
            return fn(*args, **kwargs)
        zeros = lambda: jnp.zeros((fn.bins,), jnp.float32)
        prev = self.get_variable("ghm", state_name, zeros())
        out, new_acc = fn(*args, acc_sum=prev, **kwargs)
        # sow with replace-reduce = plain mutable write, legal outside
        # compact; no-ops gracefully when 'ghm' isn't mutable (pure loss
        # evaluation).  Init stores zeros (the reference's fresh buffer).
        store = zeros() if self.is_initializing() else new_acc
        self.sow("ghm", state_name, store, init_fn=zeros,
                 reduce_fn=lambda old, new: new)
        return out

    @property
    def sampling(self) -> bool:
        """Reference semantics: anchor subsampling is on unless the cls loss
        handles imbalance itself (ref: AnchorHead.__init__ — ``self.sampling =
        loss_cls['type'] not in ['FocalLoss', 'GHMC']``)."""
        cfg = self.loss_cls or dict(type="FocalLoss")
        return cfg.get("type") not in ("FocalLoss", "GHMC")

    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_labels, gt_valid,
             img_shapes, pad_shapes, train_cfg,
             rng=None, gt_bboxes_ignore=None,
             gt_ignore_valid=None) -> Dict[str, jnp.ndarray]:
        """Args mirror the reference's loss() reshaped for fixed shapes:
        gt_bboxes (B, G, 4), gt_labels (B, G) 1-based, gt_valid (B, G) bool,
        img_shapes/pad_shapes (B, 2)."""
        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        anchors, valid = self.get_anchors(featmap_sizes, pad_shapes)
        assigner = MaxIoUAssigner(**{k: v for k, v in train_cfg["assigner"].items()
                                     if k != "type"})
        sampler = None
        if self.sampling:
            # RPN-style subsampling (ref: anchor_target sampling=True with
            # cfg.sampler; mmdet RPN default RandomSampler 256 @ 0.5).
            from ...core.bbox.samplers import build_sampler
            sampler = build_sampler(train_cfg.get(
                "sampler", dict(type="RandomSampler", num=256,
                                pos_fraction=0.5, neg_pos_ub=-1)))
            if rng is None:
                rng = self.make_rng("sampler") if self.has_rng("sampler") \
                    else jax.random.PRNGKey(0)
        targets = anchor_target(
            anchors, valid, gt_bboxes, gt_valid, gt_labels, img_shapes,
            assigner, self.target_means, self.target_stds,
            allowed_border=train_cfg.get("allowed_border", -1),
            pos_weight=train_cfg.get("pos_weight", -1),
            sampler=sampler, rng=rng,
            gt_bboxes_ignore=gt_bboxes_ignore,
            gt_ignore_valid=gt_ignore_valid)

        if self.sampling:
            # normalize by the sampled set size (ref: num_total_samples =
            # pos + neg when sampling)
            num_pos = jnp.maximum(
                targets.num_total_pos + targets.num_total_neg, 1).astype(jnp.float32)
        else:
            num_pos = jnp.maximum(targets.num_total_pos, 1).astype(jnp.float32)

        box_flat = self._flatten_levels(bbox_preds, 4)

        loss_cls = self._cls_loss_from_levels(
            cls_scores, targets.labels, targets.label_weights,
            avg_factor=num_pos)
        loss_bbox = self._call_loss(
            self._loss_bbox_fn(), "bbox_acc_sum",
            box_flat.reshape(-1, 4),
            targets.bbox_targets.reshape(-1, 4),
            weight=targets.bbox_weights.reshape(-1, 4),
            avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    # ---------------- inference decode -------------------------------------

    def _level_topk(self, scores_2d, extra_2d, boxes_2d, nms_pre: int):
        """Per-level candidate selection by max class score (ref: nms_pre
        top-k).  All (N, .) arrays; returns trimmed copies, fixed k."""
        n = scores_2d.shape[0]
        k = min(nms_pre, n)
        max_scores = jnp.max(scores_2d, axis=-1)
        _, idx = jax.lax.top_k(max_scores, k)
        extra = None if extra_2d is None else extra_2d[idx]
        return scores_2d[idx], extra, boxes_2d[idx]

    def _decode_single(self, per_level_scores, per_level_boxes,
                       per_level_factors, img_shape, nms_pre: int,
                       approx_topk: bool = False):
        """One image: per-level sigmoid/softmax -> top-k nms_pre -> decode.
        Returns (boxes (N, 4) in view space, scores (N, C)).

        ``approx_topk``: route candidate selection through the TPU's native
        partial-reduction top-k (``lax.approx_max_k``, recall ~0.95 per op)
        instead of the exact sort — the exact per-level top-k over ~157k
        anchor logits is the single hottest op in the inference tail
        (~20 ms/batch16 of a 94 ms program).  Missed candidates are
        interchangeable low-rank ones; the final top-100 is essentially
        unchanged (tests/test_approx_topk.py quantifies this)."""
        featmap_sizes = [(s.shape[0], s.shape[1]) for s in per_level_scores]
        gens = self.anchor_generators()
        level_anchors = [g.grid_anchors(fs, st) for g, fs, st in
                         zip(gens, featmap_sizes, self.anchor_strides)]
        cand_scores, cand_boxes = [], []
        for lvl, (s, bp) in enumerate(zip(per_level_scores, per_level_boxes)):
            h, w, _ = s.shape
            n = h * w * self.num_anchors
            s2 = s.reshape(n, self.cls_out_channels)
            b2 = bp.reshape(n, 4)
            # carry (anchor, delta) pairs through the same top-k gather
            pairs = jnp.concatenate([level_anchors[lvl], b2], axis=-1)
            if self.use_sigmoid_cls:
                # PERF: select by a 1-D monotone proxy (max logit [+ factor
                # logit]) so the (N, C) sigmoid runs on only the nms_pre
                # survivors — sigmoid is monotone and commutes with max
                proxy = jax.nn.log_sigmoid(
                    jnp.max(s2, axis=-1).astype(jnp.float32))
                if per_level_factors is not None:
                    f = per_level_factors[lvl].reshape(-1)
                    proxy = proxy + jax.nn.log_sigmoid(f.astype(jnp.float32))
                k = min(nms_pre, n)
                if approx_topk and n > k:
                    _, idx = jax.lax.approx_max_k(proxy, k)
                    idx = idx.astype(jnp.int32)
                else:
                    _, idx = jax.lax.top_k(proxy, k)
                probs = jax.nn.sigmoid(s2[idx])
                if per_level_factors is not None:
                    f = per_level_factors[lvl].reshape(-1)
                    probs = probs * jax.nn.sigmoid(f[idx])[:, None]
                pairs = pairs[idx]
            else:
                probs = jax.nn.softmax(s2, axis=-1)[:, 1:]  # drop bg col
                if per_level_factors is not None:
                    f = per_level_factors[lvl].reshape(-1)
                    probs = probs * jax.nn.sigmoid(f)[:, None]
                probs, _, pairs = self._level_topk(probs, None, pairs,
                                                   nms_pre)
            boxes = delta2bbox(pairs[:, :4], pairs[:, 4:], self.target_means,
                               self.target_stds, max_shape=None)
            cand_scores.append(probs)
            cand_boxes.append(clip_boxes(boxes, img_shape))
        return (jnp.concatenate(cand_boxes, axis=0),
                jnp.concatenate(cand_scores, axis=0))

    def decode_candidates(self, cls_scores, bbox_preds, img_shapes, test_cfg,
                          score_factors=None):
        """Batched pre-NMS candidates: (B, N, 4), (B, N, C) — the TTA merge
        entry point (boxes stay in view space)."""
        nms_pre = test_cfg.get("nms_pre", 1000)
        approx_topk = bool(test_cfg.get("approx_topk", False))
        n_lvl = len(cls_scores)

        def single(img_shape, *flat):
            factors = list(flat[2 * n_lvl:]) or None
            return self._decode_single(list(flat[:n_lvl]),
                                       list(flat[n_lvl:2 * n_lvl]),
                                       factors, img_shape, nms_pre,
                                       approx_topk=approx_topk)

        args = list(cls_scores) + list(bbox_preds) + (list(score_factors)
                                                      if score_factors else [])
        return jax.vmap(single)(img_shapes, *args)

    def get_bboxes(self, cls_scores, bbox_preds, img_shapes, scale_factors,
                   pad_shapes, test_cfg, rescale: bool = False,
                   score_factors=None):
        """Batched decode + NMS.  Returns (dets (B, max_per_img, 5),
        labels (B, max_per_img)) — fixed shape, label -1 padding.

        ``score_factors``: optional per-level list of (B, H, W, A) logits
        multiplying class scores (FCOS centerness hook; the IoU-aware head
        overrides rescoring instead).
        """
        boxes, scores = self.decode_candidates(cls_scores, bbox_preds,
                                               img_shapes, test_cfg,
                                               score_factors)
        return _batched_nms(boxes, scores, scale_factors, test_cfg, rescale)


def _batched_nms(boxes, scores, scale_factors, test_cfg, rescale: bool):
    """vmapped rescale + multiclass NMS over a (B, N, ...) candidate set."""
    score_thr = test_cfg.get("score_thr", 0.05)
    iou_thr = test_cfg.get("nms", {}).get("iou_thr", 0.5)
    max_per_img = test_cfg.get("max_per_img", 100)
    nms_type = test_cfg.get("nms", {}).get("type", "nms")
    pre_nms_total = test_cfg.get("pre_nms_total", 2000)
    class_topk = test_cfg.get("class_topk", None)
    approx_topk = bool(test_cfg.get("approx_topk", False))
    exact_select = test_cfg.get("exact_select", "sort")

    def single(b, s, sf):
        if rescale:
            b = b / sf
        return multiclass_nms(b, s, score_thr=score_thr, iou_thr=iou_thr,
                              max_per_img=max_per_img, nms_type=nms_type,
                              pre_nms_total=pre_nms_total,
                              class_topk=class_topk,
                              approx_topk=approx_topk,
                              exact_select=exact_select)

    return jax.vmap(single)(boxes, scores, scale_factors)


def clip_boxes(boxes: jnp.ndarray, img_shape) -> jnp.ndarray:
    """Clamp xyxy to [0, size-1] with traced (h, w) — the dynamic-shape-safe
    twin of delta2bbox's static max_shape clamp."""
    h = img_shape[0].astype(jnp.float32)
    w = img_shape[1].astype(jnp.float32)
    x1 = jnp.clip(boxes[..., 0], 0, w - 1)
    y1 = jnp.clip(boxes[..., 1], 0, h - 1)
    x2 = jnp.clip(boxes[..., 2], 0, w - 1)
    y2 = jnp.clip(boxes[..., 3], 0, h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
