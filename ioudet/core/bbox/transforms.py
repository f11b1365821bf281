"""Box <-> regression-delta transforms and result formatting.

Numerics mirror the reference exactly (ref: mmdet/core/bbox/transforms.py
(bbox2delta, delta2bbox, bbox_flip, bbox_mapping, bbox_mapping_back,
bbox2result, distance2bbox)) including the v1 "+1 pixel" width/height
convention (``w = x2 - x1 + 1``) and the ``wh_ratio_clip`` clamp — each of
these silently costs mAP if drifted.

All functions are pure jnp, fixed-shape, jit/vmap-safe.  RetinaNet uses
``target_means=(0,0,0,0), target_stds=(1,1,1,1)`` (not the two-stage .1/.2).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
               means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
               stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode gt boxes as (dx, dy, dw, dh) deltas relative to proposals.

    proposals, gt: (..., 4) xyxy.  Returns (..., 4) normalized deltas.
    """
    proposals = proposals.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)

    means = jnp.asarray(means, dtype=jnp.float32)
    stds = jnp.asarray(stds, dtype=jnp.float32)
    return (deltas - means) / stds


def delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
               means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
               stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
               max_shape: Optional[Tuple[int, int]] = None,
               wh_ratio_clip: float = 16.0 / 1000.0) -> jnp.ndarray:
    """Decode deltas on top of anchor/proposal boxes.

    rois: (..., 4) xyxy anchors; deltas: (..., 4*k) — k class-agnostic groups
    (RetinaNet uses k=1).  ``max_shape`` is the (H, W) to clamp into (the
    padded image shape at train/test time); clamp is to ``[0, size - 1]``.
    """
    rois = rois.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    k = deltas.shape[-1] // 4
    means = jnp.tile(jnp.asarray(means, dtype=jnp.float32), k)
    stds = jnp.tile(jnp.asarray(stds, dtype=jnp.float32), k)
    denorm = deltas * stds + means

    dx = denorm[..., 0::4]
    dy = denorm[..., 1::4]
    dw = denorm[..., 2::4]
    dh = denorm[..., 3::4]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    x1 = gx - gw * 0.5 + 0.5
    y1 = gy - gh * 0.5 + 0.5
    x2 = gx + gw * 0.5 - 0.5
    y2 = gy + gh * 0.5 - 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., k, 4)
    return out.reshape(deltas.shape)


def bbox_flip(bboxes: jnp.ndarray, img_shape: Tuple[int, int]) -> jnp.ndarray:
    """Horizontally flip boxes in-place w.r.t. image width.

    Matches the reference's ``x2' = w - x1 - 1`` convention.
    img_shape: (H, W).  Supports trailing extra columns (e.g. scores).
    """
    w = img_shape[1]
    x1 = w - bboxes[..., 2] - 1
    x2 = w - bboxes[..., 0] - 1
    rest = bboxes[..., 4:]
    flipped = jnp.stack([x1, bboxes[..., 1], x2, bboxes[..., 3]], axis=-1)
    if rest.shape[-1]:
        flipped = jnp.concatenate([flipped, rest], axis=-1)
    return flipped


def bbox_mapping(bboxes: jnp.ndarray, img_shape: Tuple[int, int],
                 scale_factor: float, flip: bool) -> jnp.ndarray:
    """Map boxes from original-image space into a (scaled, maybe flipped) view."""
    new = bboxes * scale_factor
    if flip:
        new = bbox_flip(new, img_shape)
    return new


def bbox_mapping_back(bboxes: jnp.ndarray, img_shape: Tuple[int, int],
                      scale_factor: float, flip: bool) -> jnp.ndarray:
    """Inverse of :func:`bbox_mapping` — used to merge TTA views."""
    new = bbox_flip(bboxes, img_shape) if flip else bboxes
    return new / scale_factor


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray,
                  max_shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Decode (left, top, right, bottom) distances around points (FCOS-style)."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2result(bboxes, labels, num_classes: int):
    """Convert (N,5) dets + labels into the reference's per-class list format
    (ref: mmdet/core/bbox/transforms.py (bbox2result)): a list of
    ``num_classes - 1`` float32 numpy arrays of shape (k, 5).

    ``labels`` are 0-based foreground class indices.  Rows with label < 0
    (fixed-shape padding) are dropped here at the host boundary — this is the
    single place the fixed-shape device world meets the variable-length host
    API.
    """
    bboxes = np.asarray(bboxes)
    labels = np.asarray(labels)
    keep = labels >= 0
    bboxes, labels = bboxes[keep], labels[keep]
    if bboxes.shape[0] == 0:
        return [np.zeros((0, 5), dtype=np.float32) for _ in range(num_classes - 1)]
    return [bboxes[labels == i].astype(np.float32) for i in range(num_classes - 1)]
