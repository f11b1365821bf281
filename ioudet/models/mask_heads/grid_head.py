"""Grid head for Grid R-CNN (ref capability: mmdet/models/mask_heads/
grid_head.py (GridHead) + mmdet/models/detectors/grid_rcnn.py).

Grid R-CNN replaces the box-regression branch with keypoint-style
localization: a 3x3 grid of points on the target box is predicted as 9
heatmaps over the RoI, and the refined box is read off the fused point
estimates.

Architecture (paper "Grid R-CNN" defaults, as in the reference):
  * 8x (3x3 conv + GN(36) + ReLU) on 14x14 RoI feats, 256 -> 576 channels
    (576 = 9 points x 64 point-feature channels);
  * spatial information fusion: every point's 64-channel feature group is
    refined by 5x5 convs from its grid neighbors (first order), then again
    from second-order neighbors — implemented as grouped convs over the
    (R, 14, 14, 9*64) tensor, dense and static-shaped (TPU-friendly: no
    per-point gather, just channel-group slices);
  * 2x (deconv 2x2 stride 2): 14 -> 28 -> 56; final 1x1-equivalent deconv
    emits 9 heatmap logits at 56x56.

Targets/loss: for each positive RoI the matched gt box's 9 grid points are
mapped into the (extended) RoI frame; a radius-1 disk around each in-frame
point is positive in the 56x56 map; loss is BCE averaged over positive
RoIs.  Points whose gt location falls outside the RoI get zero weight.
All fixed-shape: (R, 56, 56, 9) targets + (R, 9) point-validity weights.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import HEADS


def grid_points_of_box(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> (..., 9, 2) xy grid points, row-major
    (top-left, top-center, top-right, mid-left, ...)."""
    x1, y1, x2, y2 = (boxes[..., 0], boxes[..., 1],
                      boxes[..., 2], boxes[..., 3])
    fx = jnp.asarray([0.0, 0.5, 1.0] * 3)
    fy = jnp.repeat(jnp.asarray([0.0, 0.5, 1.0]), 3)
    px = x1[..., None] + (x2 - x1)[..., None] * fx
    py = y1[..., None] + (y2 - y1)[..., None] * fy
    return jnp.stack([px, py], axis=-1)


def extend_box(boxes: jnp.ndarray, factor: float = 2.0) -> jnp.ndarray:
    """Scale boxes around their center (the grid RoI uses 2x context so
    slightly-off proposals still contain all gt grid points)."""
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    hw = (boxes[..., 2] - boxes[..., 0]) * 0.5 * factor
    hh = (boxes[..., 3] - boxes[..., 1]) * 0.5 * factor
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


# first-order grid neighbors (3x3 lattice, row-major indexing)
_NEIGHBORS = {
    0: (1, 3), 1: (0, 2, 4), 2: (1, 5),
    3: (0, 4, 6), 4: (1, 3, 5, 7), 5: (2, 4, 8),
    6: (3, 7), 7: (4, 6, 8), 8: (5, 7),
}


@HEADS.register_module
class GridHead(nn.Module):
    grid_points: int = 9
    num_convs: int = 8
    in_channels: int = 256
    point_feat_channels: int = 64
    conv_out_channels: int = 576   # grid_points * point_feat_channels
    heatmap_size: int = 56
    dtype: Any = jnp.float32

    def _fusion(self, x, order: str):
        """Information fusion: each point's channel group += 5x5 conv of its
        neighbors' groups.  One pass = first order; applied to the fused
        tensor again = second order (paper Sec 3.2)."""
        c = self.point_feat_channels
        groups = [x[..., i * c:(i + 1) * c] for i in range(self.grid_points)]
        fused = []
        for i in range(self.grid_points):
            acc = groups[i]
            for j in _NEIGHBORS[i]:
                m = nn.Conv(c, (5, 5), padding=2, dtype=self.dtype,
                            name=f"fuse_{order}_{j}to{i}")(groups[j])
                acc = acc + m
            fused.append(nn.relu(acc))
        return jnp.concatenate(fused, axis=-1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=36, dtype=self.dtype,
                             name=f"gn{i}")(x)
            x = nn.relu(x)
        x = self._fusion(x, "o1")
        x = self._fusion(x, "o2")
        x = nn.relu(nn.GroupNorm(num_groups=36, dtype=self.dtype,
                                 name="gn_deconv1")(
            nn.ConvTranspose(self.conv_out_channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="deconv1")(x)))
        x = nn.ConvTranspose(self.grid_points, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="deconv2")(x)
        return x  # (R, 56, 56, 9) heatmap logits

    # ------------------------------------------------------------- targets

    def get_targets(self, rois: jnp.ndarray, gt_boxes: jnp.ndarray,
                    pos_radius: int = 1):
        """rois/gt_boxes (R, 4) in image coords (rois already extended).
        Returns (targets (R, S, S, 9) float, point_weights (R, 9))."""
        S = self.heatmap_size
        pts = grid_points_of_box(gt_boxes)           # (R, 9, 2)
        w = (rois[:, 2] - rois[:, 0])[:, None]
        h = (rois[:, 3] - rois[:, 1])[:, None]
        # point position in heatmap pixels (half-pixel-center convention)
        gx = (pts[..., 0] - rois[:, 0:1]) / jnp.maximum(w, 1e-6) * S - 0.5
        gy = (pts[..., 1] - rois[:, 1:2]) / jnp.maximum(h, 1e-6) * S - 0.5
        inside = ((gx >= 0) & (gx <= S - 1) & (gy >= 0) & (gy <= S - 1))
        xs = jnp.arange(S, dtype=jnp.float32)
        d2 = ((xs[None, :, None, None] - gy[:, None, None, :]) ** 2 +
              (xs[None, None, :, None] - gx[:, None, None, :]) ** 2)
        targets = (d2 <= pos_radius ** 2).astype(jnp.float32)
        return targets, inside.astype(jnp.float32)

    @staticmethod
    def loss(heatmap_pred, targets, point_weights, pos_mask):
        """BCE over each positive RoI's in-frame points."""
        from ..losses.cross_entropy_loss import binary_cross_entropy_with_logits

        bce = binary_cross_entropy_with_logits(heatmap_pred, targets)
        # (R, S, S, 9) -> per-point mean, weighted by in-frame validity
        per_pt = bce.mean(axis=(1, 2)) * point_weights     # (R, 9)
        per_roi = per_pt.sum(-1) * pos_mask
        denom = jnp.maximum(jnp.sum(point_weights * pos_mask[:, None]), 1.0)
        return jnp.sum(per_roi) / denom

    # ------------------------------------------------------------- decode

    def get_bboxes(self, det_boxes: jnp.ndarray, heatmaps: jnp.ndarray,
                   extend_factor: float = 2.0):
        """Refine det boxes from predicted grids.

        det_boxes (N, 4) original (unextended) boxes; heatmaps (N, S, S, 9)
        logits over the EXTENDED RoI.  Each edge is the confidence-weighted
        average of its three points' relevant coordinate (paper Eq. 2)."""
        S = self.heatmap_size
        rois = extend_box(det_boxes, extend_factor)
        probs = jax.nn.sigmoid(heatmaps)
        flat = probs.reshape(probs.shape[0], S * S, self.grid_points)
        idx = jnp.argmax(flat, axis=1)                      # (N, 9)
        conf = jnp.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0]
        py = (idx // S).astype(jnp.float32) + 0.5
        px = (idx % S).astype(jnp.float32) + 0.5
        w = (rois[:, 2] - rois[:, 0])[:, None]
        h = (rois[:, 3] - rois[:, 1])[:, None]
        ix = rois[:, 0:1] + px / S * w                      # image coords
        iy = rois[:, 1:2] + py / S * h

        def wavg(vals, confs):
            return (vals * confs).sum(-1) / jnp.maximum(confs.sum(-1), 1e-6)

        x1 = wavg(ix[:, (0, 3, 6)], conf[:, (0, 3, 6)])
        y1 = wavg(iy[:, (0, 1, 2)], conf[:, (0, 1, 2)])
        x2 = wavg(ix[:, (2, 5, 8)], conf[:, (2, 5, 8)])
        y2 = wavg(iy[:, (6, 7, 8)], conf[:, (6, 7, 8)])
        return jnp.stack([x1, y1, x2, y2], axis=-1)
