"""FCOS head (ref: mmdet/models/anchor_heads/fcos_head.py (FCOSHead)).

Anchor-free single-stage head: per-level towers (4x conv+GN+ReLU), 1x1-ish
3x3 heads for class logits, (l, t, r, b) distances (exp + per-level learned
Scale), and centerness (on the cls tower at this vintage).

Fixed-shape targets, fully vectorized: for every point x every (padded) gt,
compute containment + regress-range masks, pick the min-area gt — the
reference's per-image Python loops become one (P, G) tensor computation.
Loss: focal + IoULoss on decoded boxes + centerness BCE.
Inference: distance2bbox, score * centerness, shared NMS machinery.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox import bbox_overlaps, distance2bbox
from ..registry import HEADS
from ..utils.layers import Scale, bias_init_with_prob
from .anchor_head import _CONV_INIT, _batched_nms, clip_boxes

INF = 1e8


def level_points(feat_size: Tuple[int, int], stride: int) -> np.ndarray:
    """Point centers (ref: FCOSHead.get_points): stride/2 offset grid."""
    h, w = feat_size
    ys = (np.arange(h, dtype=np.float32) * stride) + stride // 2
    xs = (np.arange(w, dtype=np.float32) * stride) + stride // 2
    xx = np.tile(xs, h)
    yy = np.repeat(ys, w)
    return np.stack([xx, yy], -1)  # (h*w, 2)


@HEADS.register_module
class FCOSHead(nn.Module):
    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
    loss_cls: Any = None
    loss_bbox: Any = None
    dtype: Any = jnp.float32

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes - 1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cls_convs, reg_convs = [], []
        for i in range(self.stacked_convs):
            cls_convs.append((
                nn.Conv(self.feat_channels, (3, 3), padding=1, use_bias=True,
                        kernel_init=_CONV_INIT, dtype=self.dtype,
                        name=f"cls_conv{i}"),
                nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"cls_gn{i}")))
            reg_convs.append((
                nn.Conv(self.feat_channels, (3, 3), padding=1, use_bias=True,
                        kernel_init=_CONV_INIT, dtype=self.dtype,
                        name=f"reg_conv{i}"),
                nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"reg_gn{i}")))
        conv_cls = nn.Conv(self.cls_out_channels, (3, 3), padding=1,
                           kernel_init=_CONV_INIT,
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)),
                           dtype=self.dtype, name="fcos_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1, kernel_init=_CONV_INIT,
                           dtype=self.dtype, name="fcos_reg")
        conv_centerness = nn.Conv(1, (3, 3), padding=1, kernel_init=_CONV_INIT,
                                  dtype=self.dtype, name="fcos_centerness")
        scales = [Scale(1.0, name=f"scale{i}") for i in range(len(self.strides))]

        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for conv, gn in cls_convs:
                cls_feat = nn.relu(gn(conv(cls_feat)))
            for conv, gn in reg_convs:
                reg_feat = nn.relu(gn(conv(reg_feat)))
            cls_scores.append(conv_cls(cls_feat))
            centernesses.append(conv_centerness(cls_feat))  # v1: cls tower
            bbox_preds.append(jnp.exp(scales[lvl](conv_reg(reg_feat))))
        return cls_scores, bbox_preds, centernesses

    # ------------------------------------------------------------------ targets

    def _targets_single(self, points, ranges, gt_bboxes, gt_valid, gt_labels):
        """points (P, 2); ranges (P, 2); padded gts.  Returns labels (P,),
        bbox_targets (P, 4) as (l, t, r, b)."""
        P = points.shape[0]
        G = gt_bboxes.shape[0]
        areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0] + 1) * \
                (gt_bboxes[:, 3] - gt_bboxes[:, 1] + 1)
        xs, ys = points[:, 0:1], points[:, 1:2]               # (P, 1)
        left = xs - gt_bboxes[:, 0][None, :]                   # (P, G)
        right = gt_bboxes[:, 2][None, :] - xs
        top = ys - gt_bboxes[:, 1][None, :]
        bottom = gt_bboxes[:, 3][None, :] - ys
        ltrb = jnp.stack([left, top, right, bottom], -1)       # (P, G, 4)
        inside = jnp.min(ltrb, -1) > 0
        maxd = jnp.max(ltrb, -1)
        in_range = (maxd >= ranges[:, 0:1]) & (maxd <= ranges[:, 1:2])
        ok = inside & in_range & gt_valid[None, :]
        cand_areas = jnp.where(ok, areas[None, :], INF)
        min_idx = jnp.argmin(cand_areas, axis=1)               # (P,)
        has = jnp.min(cand_areas, axis=1) < INF
        labels = jnp.where(has, gt_labels[min_idx], 0).astype(jnp.int32)
        bt = jnp.take_along_axis(ltrb, min_idx[:, None, None].repeat(4, -1),
                                 axis=1)[:, 0]
        bt = bt * has[:, None]
        return labels, bt

    @staticmethod
    def centerness_target(ltrb: jnp.ndarray) -> jnp.ndarray:
        lr = ltrb[..., 0::2]
        tb = ltrb[..., 1::2]
        num = (jnp.min(lr, -1) * jnp.min(tb, -1))
        den = jnp.maximum(jnp.max(lr, -1) * jnp.max(tb, -1), 1e-10)
        return jnp.sqrt(jnp.clip(num / den, 0.0, None))

    # ------------------------------------------------------------------ loss

    def loss(self, cls_scores, bbox_preds, centernesses, gt_bboxes, gt_labels,
             gt_valid, img_shapes, pad_shapes, train_cfg) -> Dict[str, jnp.ndarray]:
        from ..losses.cross_entropy_loss import binary_cross_entropy_with_logits
        from ..losses.focal_loss import sigmoid_focal_loss
        from ..losses.iou_loss import iou_loss

        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        pts, rngs = [], []
        for fs, s, rr in zip(featmap_sizes, self.strides, self.regress_ranges):
            p = level_points(fs, s)
            pts.append(jnp.asarray(p))
            rngs.append(jnp.broadcast_to(jnp.asarray(rr, jnp.float32),
                                         (p.shape[0], 2)))
        points = jnp.concatenate(pts)        # (P, 2)
        ranges = jnp.concatenate(rngs)       # (P, 2)

        def single(gb, gv, gl):
            return self._targets_single(points, ranges, gb, gv, gl)

        labels, ltrb_t = jax.vmap(single)(gt_bboxes, gt_valid, gt_labels)

        B = labels.shape[0]
        cls_flat = jnp.concatenate(
            [c.reshape(B, -1, self.cls_out_channels) for c in cls_scores], 1)
        reg_flat = jnp.concatenate([b.reshape(B, -1, 4) for b in bbox_preds], 1)
        ctr_flat = jnp.concatenate([c.reshape(B, -1) for c in centernesses], 1)

        pos = labels > 0
        num_pos = jnp.maximum(jnp.sum(pos), 1).astype(jnp.float32)
        loss_cls = sigmoid_focal_loss(
            cls_flat.reshape(-1, self.cls_out_channels), labels.reshape(-1),
            avg_factor=num_pos)

        ctr_t = self.centerness_target(ltrb_t)
        pts_b = jnp.broadcast_to(points[None], (B,) + points.shape)
        decoded = distance2bbox(pts_b, reg_flat)
        target_boxes = distance2bbox(pts_b, ltrb_t)
        posf = pos.astype(jnp.float32)
        # centerness-weighted IoU loss (ref: loss_bbox weighted by centerness)
        ious = jnp.clip(bbox_overlaps(decoded, target_boxes, is_aligned=True),
                        1e-6, None)
        w = posf * ctr_t
        loss_bbox = jnp.sum(-jnp.log(ious) * w) / jnp.maximum(jnp.sum(w), 1e-6)
        loss_centerness = jnp.sum(
            binary_cross_entropy_with_logits(ctr_flat, ctr_t) * posf) / num_pos
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_centerness)

    # ------------------------------------------------------------------ decode

    def decode_candidates(self, cls_scores, bbox_preds, centernesses,
                          img_shapes, test_cfg):
        nms_pre = test_cfg.get("nms_pre", 1000)
        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        lvl_points = [jnp.asarray(level_points(fs, s))
                      for fs, s in zip(featmap_sizes, self.strides)]
        n_lvl = len(cls_scores)

        def single(img_shape, *flat):
            scores_l = flat[:n_lvl]
            box_l = flat[n_lvl:2 * n_lvl]
            ctr_l = flat[2 * n_lvl:]
            cand_b, cand_s = [], []
            for lvl in range(n_lvl):
                h, w, _ = scores_l[lvl].shape
                n = h * w
                p = jax.nn.sigmoid(scores_l[lvl].reshape(n, -1))
                ctr = jax.nn.sigmoid(ctr_l[lvl].reshape(n))
                s2 = p * ctr[:, None]
                k = min(nms_pre, n)
                maxs = jnp.max(s2, -1)
                _, idx = jax.lax.top_k(maxs, k)
                boxes = distance2bbox(lvl_points[lvl][idx],
                                      box_l[lvl].reshape(n, 4)[idx])
                cand_b.append(clip_boxes(boxes, img_shape))
                cand_s.append(s2[idx])
            return jnp.concatenate(cand_b), jnp.concatenate(cand_s)

        args = list(cls_scores) + list(bbox_preds) + list(centernesses)
        return jax.vmap(single)(img_shapes, *args)

    def get_bboxes(self, cls_scores, bbox_preds, centernesses, img_shapes,
                   scale_factors, pad_shapes, test_cfg, rescale: bool = False):
        boxes, scores = self.decode_candidates(cls_scores, bbox_preds,
                                               centernesses, img_shapes,
                                               test_cfg)
        return _batched_nms(boxes, scores, scale_factors, test_cfg, rescale)
