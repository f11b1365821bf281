"""Mask targets (ref: mmdet/core/mask/mask_target.py (mask_target)).

TPU-native mask representation: each gt instance's mask is stored as a FIXED
(S, S) crop in its own box frame (S=112), rasterized once on the host from
the polygon — never a full-image bitmap.  This keeps samples rectangular
(max_gt x S x S) and makes geometric transforms trivial (box-frame masks are
scale-invariant; horizontal flip mirrors the crop).  The same trick is used
by TF TPU Mask R-CNN.

``mask_target_single`` then resamples the gt's box-frame mask into a sampled
RoI's window at 28x28 — a pure bilinear gather, replacing the reference's
host-side cv2 crop+resize loop.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rasterize_polygons(polygons, box, out_size: int = 112) -> np.ndarray:
    """Host-side: rasterize COCO polygon(s) into the box frame (S, S) uint8.
    Replaces pycocotools' RLE decode (ref: LoadAnnotations._load_masks)."""
    from PIL import Image, ImageDraw

    x1, y1, x2, y2 = box
    w = max(x2 - x1, 1e-3)
    h = max(y2 - y1, 1e-3)
    img = Image.new("L", (out_size, out_size), 0)
    draw = ImageDraw.Draw(img)
    for poly in polygons:
        pts = np.asarray(poly, np.float32).reshape(-1, 2)
        pts[:, 0] = (pts[:, 0] - x1) / w * out_size
        pts[:, 1] = (pts[:, 1] - y1) / h * out_size
        if len(pts) >= 3:
            draw.polygon([tuple(p) for p in pts], fill=1)
    return np.asarray(img, np.uint8)


@partial(jax.jit, static_argnames=("out_size",))
def crop_mask_to_roi(gt_mask: jnp.ndarray, gt_box: jnp.ndarray,
                     roi_box: jnp.ndarray, out_size: int = 28) -> jnp.ndarray:
    """Resample a box-frame gt mask (S, S) into an RoI window (out, out).

    Coordinates: a point p in the roi maps to ((p - gt_xy) / gt_wh) * S in
    the mask frame; outside [0, S) samples 0 (mask ends at the box)."""
    S = gt_mask.shape[0]
    x1, y1, x2, y2 = roi_box[0], roi_box[1], roi_box[2], roi_box[3]
    gx1, gy1, gx2, gy2 = gt_box[0], gt_box[1], gt_box[2], gt_box[3]
    gw = jnp.maximum(gx2 - gx1, 1e-3)
    gh = jnp.maximum(gy2 - gy1, 1e-3)
    ys = y1 + (jnp.arange(out_size) + 0.5) / out_size * (y2 - y1)
    xs = x1 + (jnp.arange(out_size) + 0.5) / out_size * (x2 - x1)
    my = (ys - gy1) / gh * S - 0.5
    mx = (xs - gx1) / gw * S - 0.5
    y0 = jnp.floor(my).astype(jnp.int32)
    x0 = jnp.floor(mx).astype(jnp.int32)
    wy = my - y0
    wx = mx - x0
    m = gt_mask.astype(jnp.float32)

    def at(yi, xi):
        inb = ((yi >= 0) & (yi < S))[:, None] & ((xi >= 0) & (xi < S))[None, :]
        v = m[jnp.clip(yi, 0, S - 1)][:, jnp.clip(xi, 0, S - 1)]
        return jnp.where(inb, v, 0.0)

    top = at(y0, x0) * (1 - wx)[None, :] + at(y0, x0 + 1) * wx[None, :]
    bot = at(y0 + 1, x0) * (1 - wx)[None, :] + at(y0 + 1, x0 + 1) * wx[None, :]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


def mask_target(gt_masks: jnp.ndarray, gt_boxes: jnp.ndarray,
                rois: jnp.ndarray, roi_gt_idx: jnp.ndarray,
                pos_mask: jnp.ndarray, out_size: int = 28) -> jnp.ndarray:
    """Batched: gt_masks (G, S, S); gt_boxes (G, 4); rois (R, 4);
    roi_gt_idx (R,) assigned gt per roi; pos_mask (R,).
    Returns (R, out, out) float targets (0 for non-positives)."""
    G = gt_masks.shape[0]
    safe = jnp.clip(roi_gt_idx, 0, G - 1)

    def one(roi, gi, p):
        t = crop_mask_to_roi(gt_masks[gi], gt_boxes[gi], roi, out_size)
        return t * p

    return jax.vmap(one)(rois, safe, pos_mask.astype(jnp.float32))
