"""IoU-based box regression losses (ref: mmdet/models/losses/iou_loss.py
(iou_loss, bounded_iou_loss, IoULoss, BoundedIoULoss)), plus GIoU for breadth.

These operate on decoded xyxy boxes (the reference applies them in FCOS/GA
configs).  Kept jnp-pure and fixed-shape.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.bbox.geometry import bbox_overlaps
from ..registry import LOSSES
from .utils import weighted_loss


@weighted_loss
def iou_loss(pred, target, eps: float = 1e-6):
    ious = jnp.clip(bbox_overlaps(pred, target, is_aligned=True), eps, None)
    return -jnp.log(ious)


@weighted_loss
def bounded_iou_loss(pred, target, beta: float = 0.2, eps: float = 1e-3):
    """ref formula: smooth-L1 on (1 - IoU-ish per-coordinate proxies)."""
    px = (pred[..., 0] + pred[..., 2]) * 0.5
    py = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0] + 1.0
    ph = pred[..., 3] - pred[..., 1] + 1.0
    tx = (target[..., 0] + target[..., 2]) * 0.5
    ty = (target[..., 1] + target[..., 3]) * 0.5
    tw = target[..., 2] - target[..., 0] + 1.0
    th = target[..., 3] - target[..., 1] + 1.0

    dx = tx - px
    dy = ty - py
    loss_dx = 1.0 - jnp.maximum((tw - 2.0 * jnp.abs(dx)) / (tw + 2.0 * jnp.abs(dx)), 0.0)
    loss_dy = 1.0 - jnp.maximum((th - 2.0 * jnp.abs(dy)) / (th + 2.0 * jnp.abs(dy)), 0.0)
    loss_dw = 1.0 - jnp.minimum(tw / jnp.maximum(pw, eps), pw / jnp.maximum(tw, eps))
    loss_dh = 1.0 - jnp.minimum(th / jnp.maximum(ph, eps), ph / jnp.maximum(th, eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    return jnp.where(comb < beta, 0.5 * comb * comb / beta, comb - 0.5 * beta)


@weighted_loss
def giou_loss(pred, target, eps: float = 1e-7):
    ious = bbox_overlaps(pred, target, is_aligned=True)
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    enclose = wh[..., 0] * wh[..., 1]
    area_p = (pred[..., 2] - pred[..., 0] + 1.0) * (pred[..., 3] - pred[..., 1] + 1.0)
    area_t = (target[..., 2] - target[..., 0] + 1.0) * (target[..., 3] - target[..., 1] + 1.0)
    # recover the intersection from iou = inter / (A + B - inter)
    inter = ious * (area_p + area_t) / (1.0 + ious)
    union = area_p + area_t - inter
    gious = ious - (enclose - union) / jnp.maximum(enclose, eps)
    return 1.0 - gious


@LOSSES.register_module
class IoULoss:
    def __init__(self, eps: float = 1e-6, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(axis=-1)
        return self.loss_weight * iou_loss(pred, target, weight,
                                           reduction=reduction,
                                           avg_factor=avg_factor, eps=self.eps)


@LOSSES.register_module
class BoundedIoULoss:
    def __init__(self, beta: float = 0.2, eps: float = 1e-3,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.beta = beta
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(axis=-1)
        return self.loss_weight * bounded_iou_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor,
            beta=self.beta, eps=self.eps)


@LOSSES.register_module
class GIoULoss:
    def __init__(self, eps: float = 1e-7, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(axis=-1)
        return self.loss_weight * giou_loss(pred, target, weight,
                                            reduction=reduction,
                                            avg_factor=avg_factor, eps=self.eps)
