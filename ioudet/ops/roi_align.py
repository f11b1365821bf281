"""RoIAlign / RoIPool (ref: mmdet/ops/roi_align/src/roi_align_kernel.cu
(ROIAlignForward), mmdet/ops/roi_pool/) as pure-XLA gather + bilinear ops.

The CUDA kernels exist because torch lacked a fused bilinear-sampled pooling;
on TPU the same math is a batched gather of 4 corners + weighted sum, which
XLA fuses — and autodiff gives the exact backward for free (the reference
hand-writes ~250 lines of atomicAdd backward).

v1 semantics preserved: rois are (batch_idx, x1, y1, x2, y2) in image
coordinates, scaled by ``spatial_scale``; bin size = roi_size / pooled_size;
``sample_num`` regular samples per bin axis, averaged.  (No +0.5 "aligned"
offset — that arrived in later mmcv versions.)

Fixed-shape: R is static (padded rois with batch_idx < 0 produce zeros).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """feat (H, W, C); y/x arbitrary-shaped sample coords.  Samples outside
    [0, H-1]x[0, W-1] clamp (matching the kernel's boundary handling)."""
    h, w, _ = feat.shape
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = y - y0
    wx = x - x0
    f00 = feat[y0, x0]
    f01 = feat[y0, x1]
    f10 = feat[y1, x0]
    f11 = feat[y1, x1]
    return (f00 * ((1 - wy) * (1 - wx))[..., None] +
            f01 * ((1 - wy) * wx)[..., None] +
            f10 * (wy * (1 - wx))[..., None] +
            f11 * (wy * wx)[..., None])


@partial(jax.jit, static_argnames=("pooled_size", "sample_num"))
def roi_align(feats: jnp.ndarray, rois: jnp.ndarray,
              pooled_size: int = 7, spatial_scale: float = 1.0 / 16,
              sample_num: int = 2) -> jnp.ndarray:
    """feats (B, H, W, C) NHWC; rois (R, 5).  Returns (R, P, P, C)."""
    p, s = pooled_size, max(sample_num, 1)

    def one_roi(roi):
        bidx = roi[0].astype(jnp.int32)
        x1, y1, x2, y2 = roi[1] * spatial_scale, roi[2] * spatial_scale, \
            roi[3] * spatial_scale, roi[4] * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1e-6)
        roi_h = jnp.maximum(y2 - y1, 1e-6)
        bin_w = roi_w / p
        bin_h = roi_h / p
        # sample grid: s regular samples per bin axis, offset (i+.5)/s
        ii = (jnp.arange(p * s) + 0.5) / s  # positions in bin units
        ys = y1 + ii * bin_h
        xs = x1 + ii * bin_w
        yy = jnp.broadcast_to(ys[:, None], (p * s, p * s))
        xx = jnp.broadcast_to(xs[None, :], (p * s, p * s))
        feat = feats[jnp.clip(bidx, 0, feats.shape[0] - 1)]
        samples = _bilinear_sample(feat, yy, xx)          # (ps, ps, C)
        pooled = samples.reshape(p, s, p, s, -1).mean(axis=(1, 3))
        return jnp.where(bidx >= 0, pooled, jnp.zeros_like(pooled))

    return jax.vmap(one_roi)(rois)


@partial(jax.jit, static_argnames=("pooled_size", "sample_num"))
def roi_pool(feats: jnp.ndarray, rois: jnp.ndarray, pooled_size: int = 7,
             spatial_scale: float = 1.0 / 16,
             sample_num: int = 4) -> jnp.ndarray:
    """Max-pool RoI extraction (legacy two-stage op).  Dense-sampled max:
    the exact kernel maxes over integer cells in each (dynamic-size) bin;
    here each bin is maxed over a fixed sxs sample grid — fixed-shape, and
    converges to the exact max as s grows."""
    p, s = pooled_size, max(sample_num, 1)

    def one_roi(roi):
        bidx = roi[0].astype(jnp.int32)
        x1, y1 = roi[1] * spatial_scale, roi[2] * spatial_scale
        x2, y2 = roi[3] * spatial_scale, roi[4] * spatial_scale
        bin_w = jnp.maximum(x2 - x1 + 1, 1.0) / p
        bin_h = jnp.maximum(y2 - y1 + 1, 1.0) / p
        ii = (jnp.arange(p * s) + 0.5) / s
        ys = y1 + ii * bin_h
        xs = x1 + ii * bin_w
        yy = jnp.broadcast_to(ys[:, None], (p * s, p * s))
        xx = jnp.broadcast_to(xs[None, :], (p * s, p * s))
        feat = feats[jnp.clip(bidx, 0, feats.shape[0] - 1)]
        samples = _bilinear_sample(feat, yy, xx)
        pooled = samples.reshape(p, s, p, s, -1).max(axis=(1, 3))
        return jnp.where(bidx >= 0, pooled, jnp.zeros_like(pooled))

    return jax.vmap(one_roi)(rois)
