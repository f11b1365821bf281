"""Mask-IoU head (ref: mmdet/models/mask_heads/maskiou_head.py (MaskIoUHead),
Mask Scoring R-CNN) — the instance-segmentation sibling of the fork's
IoU-aware idea: predict the mask's IoU with its gt and rescore
classification confidence by it at test time.

Input: mask-head RoI features concatenated with the (max-pooled) predicted
mask; a small conv+fc tower regresses per-class mask IoU.  Training target =
IoU between the binarized predicted mask and the gt mask target (computed in
the box frame — exact for box-frame masks); L2 loss on positives.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..heads.anchor_head import _CONV_INIT
from ..registry import HEADS


@HEADS.register_module
class MaskIoUHead(nn.Module):
    num_convs: int = 4
    num_fcs: int = 2
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 81
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mask_feat, mask_pred, train: bool = False):
        """mask_feat (R, 14, 14, C); mask_pred (R, 28, 28) for the target
        class (probabilities).  Returns (R, num_classes - 1) IoU logits."""
        # downsample the mask to the feature grid and concat as a channel
        pooled = nn.max_pool(mask_pred[..., None], (2, 2), strides=(2, 2))
        x = jnp.concatenate([mask_feat, pooled], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1  # ref: last conv /2
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                strides=(stride, stride), padding=1,
                                kernel_init=_CONV_INIT, dtype=self.dtype,
                                name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"fc{i}")(x))
        return nn.Dense(self.num_classes - 1, dtype=self.dtype,
                        name="fc_mask_iou")(x)

    @staticmethod
    def mask_iou_target(mask_pred, mask_targets, thr: float = 0.5):
        """IoU between the binarized predicted mask and the gt target, both
        in the RoI frame (R, 28, 28) -> (R,).  Simplified variant that
        ignores gt-mask area OUTSIDE the RoI; the reference rule is
        :meth:`mask_iou_target_ref`."""
        p = mask_pred > thr
        t = mask_targets > thr
        inter = jnp.sum(p & t, axis=(1, 2)).astype(jnp.float32)
        union = jnp.sum(p | t, axis=(1, 2)).astype(jnp.float32)
        return inter / jnp.maximum(union, 1.0)

    @staticmethod
    def mask_iou_target_ref(mask_pred, mask_targets, roi_boxes, gt_boxes,
                            gt_crop_fracs, thr: float = 0.5):
        """Reference mask-IoU target (ref: mmdet/models/mask_heads/
        maskiou_head.py (MaskIoUHead.get_target, _get_area_ratio)): the gt
        area in the denominator is the FULL gt mask area, recovered from the
        in-RoI target via the area ratio — so a proposal covering half the
        object cannot score IoU 1 against its own crop.

        All grid quantities live in the (out x out) RoI raster like the
        reference:
            pred_areas   = binarized pred area
            overlap      = (pred_bin * target).sum
            gt_full_grid = target.sum / area_ratio
            iou          = overlap / (pred + gt_full_grid - overlap)
        with area_ratio = gt-area-inside-RoI / full-gt-area computed in
        IMAGE pixels: target mean x RoI pixel area vs crop-fraction x gt box
        pixel area (our gt masks are fixed box-frame crops, so the full-mask
        area is crop_frac * gt box area — exact for the same rasterization).

        mask_pred/mask_targets: (R, S, S); roi_boxes/gt_boxes: (R, 4) xyxy;
        gt_crop_fracs: (R,) mean of the matched gt's crop raster.
        """
        p = (mask_pred > thr).astype(jnp.float32)
        t = mask_targets.astype(jnp.float32)
        S2 = mask_pred.shape[1] * mask_pred.shape[2]
        pred_areas = jnp.sum(p, axis=(1, 2))
        overlap = jnp.sum(p * t, axis=(1, 2))
        t_sum = jnp.sum(t, axis=(1, 2))

        def _area(b):
            return jnp.clip(b[:, 2] - b[:, 0], 0, None) * \
                jnp.clip(b[:, 3] - b[:, 1], 0, None)

        gt_in_roi_px = t_sum / S2 * _area(roi_boxes)
        gt_full_px = gt_crop_fracs * _area(gt_boxes)
        area_ratio = jnp.clip(gt_in_roi_px / jnp.maximum(gt_full_px, 1e-7),
                              1e-7, 1.0)
        gt_full_grid = t_sum / area_ratio
        iou = overlap / jnp.maximum(pred_areas + gt_full_grid - overlap,
                                    1e-7)
        # degenerate gt (empty mask) -> target 0, like the reference's
        # zero-fill for empty bins
        return jnp.where(gt_full_px > 0, jnp.clip(iou, 0.0, 1.0), 0.0)

    @staticmethod
    def loss(iou_pred, iou_target, labels, pos_mask):
        """L2 on the target class channel over positives (ref: MSE loss)."""
        C = iou_pred.shape[-1]
        safe = jnp.clip(labels - 1, 0, C - 1)
        per = jnp.take_along_axis(iou_pred, safe[:, None], axis=-1)[:, 0]
        d = per - iou_target
        return 0.5 * jnp.sum(d * d * pos_mask) / jnp.maximum(
            jnp.sum(pos_mask), 1.0)
