"""IoU / IoF box overlaps (ref: mmdet/core/bbox/geometry.py (bbox_overlaps)).

Keeps the v1 "+1 pixel" area convention: ``area = (x2 - x1 + 1) * (y2 - y1 + 1)``.
Pure jnp, fixed-shape.  The ``is_aligned=True`` path is what the IoU-aware
head's training target uses; the pairwise path is the assigner's hot spot
(A x G matrix, vectorized — no host loop).
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_overlaps(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray, mode: str = "iou",
                  is_aligned: bool = False, eps: float = 0.0) -> jnp.ndarray:
    """Pairwise or aligned overlaps.

    bboxes1: (..., M, 4); bboxes2: (..., N, 4) (or (..., M, 4) if aligned).
    mode: 'iou' (union) or 'iof' (intersection over bboxes1's area).
    Returns (..., M, N) or (..., M) if aligned.
    """
    assert mode in ("iou", "iof")
    b1 = bboxes1.astype(jnp.float32)
    b2 = bboxes2.astype(jnp.float32)

    if is_aligned:
        lt = jnp.maximum(b1[..., :2], b2[..., :2])
        rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
        wh = jnp.clip(rb - lt + 1.0, 0.0, None)
        overlap = wh[..., 0] * wh[..., 1]
        area1 = (b1[..., 2] - b1[..., 0] + 1.0) * (b1[..., 3] - b1[..., 1] + 1.0)
        if mode == "iou":
            area2 = (b2[..., 2] - b2[..., 0] + 1.0) * (b2[..., 3] - b2[..., 1] + 1.0)
            denom = area1 + area2 - overlap
        else:
            denom = area1
    else:
        lt = jnp.maximum(b1[..., :, None, :2], b2[..., None, :, :2])
        rb = jnp.minimum(b1[..., :, None, 2:], b2[..., None, :, 2:])
        wh = jnp.clip(rb - lt + 1.0, 0.0, None)
        overlap = wh[..., 0] * wh[..., 1]
        area1 = (b1[..., 2] - b1[..., 0] + 1.0) * (b1[..., 3] - b1[..., 1] + 1.0)
        if mode == "iou":
            area2 = (b2[..., 2] - b2[..., 0] + 1.0) * (b2[..., 3] - b2[..., 1] + 1.0)
            denom = area1[..., :, None] + area2[..., None, :] - overlap
        else:
            denom = area1[..., :, None] * jnp.ones_like(overlap)
    return overlap / jnp.maximum(denom, jnp.float32(eps if eps > 0 else 1e-10))
