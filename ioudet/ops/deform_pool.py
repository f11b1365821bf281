"""Deformable RoI pooling (ref: mmdet/ops/dcn/src/deform_pool_cuda.cpp +
deform_pool_cuda_kernel.cu, python wrapper mmdet/ops/dcn/deform_pool.py
(DeformRoIPooling, DeformRoIPoolingPack, ModulatedDeformRoIPoolingPack)).

The CUDA kernel exists to fuse per-bin offset lookup with bilinear pooling;
on TPU the same math is the RoIAlign sampling grid shifted by learned
per-bin offsets — a pure gather+weighted-sum that XLA fuses, with exact
autodiff through both features and offsets for free (the reference
hand-writes the offset backward).

Semantics preserved from the reference kernel:
  * bin (i, j) of an (x1, y1)-anchored RoI samples an s x s sub-grid whose
    positions are shifted by ``offset[i, j] * trans_std * (roi_w, roi_h)``
    (offsets are normalized by roi size, scaled by trans_std);
  * the "Pack" modules predict offsets from a first, offset-free pooling
    pass through a small FC stack; the modulated variant also predicts a
    per-bin sigmoid mask multiplied into the output.

Fixed-shape: R static; padding rois (batch_idx < 0) produce zeros.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .roi_align import _bilinear_sample


@partial(jax.jit, static_argnames=("pooled_size", "sample_num"))
def deform_roi_pool(feats: jnp.ndarray, rois: jnp.ndarray,
                    offsets: Optional[jnp.ndarray] = None,
                    pooled_size: int = 7,
                    spatial_scale: float = 1.0 / 16,
                    sample_num: int = 2,
                    trans_std: float = 0.1) -> jnp.ndarray:
    """feats (B, H, W, C); rois (R, 5); offsets (R, P, P, 2) as (dy, dx)
    normalized by RoI size (or None for plain aligned pooling).
    Returns (R, P, P, C)."""
    p, s = pooled_size, max(sample_num, 1)
    if offsets is None:
        offsets = jnp.zeros((rois.shape[0], p, p, 2), feats.dtype)

    def one_roi(roi, off):
        bidx = roi[0].astype(jnp.int32)
        x1, y1 = roi[1] * spatial_scale, roi[2] * spatial_scale
        x2, y2 = roi[3] * spatial_scale, roi[4] * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1e-6)
        roi_h = jnp.maximum(y2 - y1, 1e-6)
        bin_w = roi_w / p
        bin_h = roi_h / p
        ii = (jnp.arange(p * s) + 0.5) / s          # bin units
        ys = y1 + ii * bin_h                         # (p*s,)
        xs = x1 + ii * bin_w
        # per-bin shift, broadcast to that bin's s x s samples
        dy = jnp.repeat(off[..., 0] * trans_std * roi_h, s, axis=0)
        dy = jnp.repeat(dy, s, axis=1)               # (p*s, p*s)
        dx = jnp.repeat(off[..., 1] * trans_std * roi_w, s, axis=0)
        dx = jnp.repeat(dx, s, axis=1)
        yy = ys[:, None] + dy
        xx = xs[None, :] + dx
        feat = feats[jnp.clip(bidx, 0, feats.shape[0] - 1)]
        samples = _bilinear_sample(feat, yy, xx)
        pooled = samples.reshape(p, s, p, s, -1).mean(axis=(1, 3))
        return jnp.where(bidx >= 0, pooled, jnp.zeros_like(pooled))

    return jax.vmap(one_roi)(rois, offsets)


class DeformRoIPoolingPack(nn.Module):
    """Two-pass deformable RoI pooling with learned offsets (ref:
    DeformRoIPoolingPack): pass 1 pools offset-free, an FC stack maps the
    pooled feature to (P, P, 2) offsets, pass 2 pools with them."""

    out_size: int = 7
    spatial_scale: float = 1.0 / 16
    sample_num: int = 2
    trans_std: float = 0.1
    deform_fc_channels: int = 1024
    dtype: Any = jnp.float32

    def _offsets(self, feats, rois, extra_dims: int = 2):
        p = self.out_size
        base = deform_roi_pool(feats, rois, None, pooled_size=p,
                               spatial_scale=self.spatial_scale,
                               sample_num=self.sample_num)
        f = base.reshape(base.shape[0], -1)
        f = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                             name="offset_fc1")(f))
        f = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                             name="offset_fc2")(f))
        # zero-init so training starts as plain RoIAlign (ref init)
        out = nn.Dense(p * p * extra_dims, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="offset_fc3")(f)
        return out.reshape(-1, p, p, extra_dims)

    @nn.compact
    def __call__(self, feats, rois):
        off = self._offsets(feats, rois, extra_dims=2)
        return deform_roi_pool(feats, rois, off, pooled_size=self.out_size,
                               spatial_scale=self.spatial_scale,
                               sample_num=self.sample_num,
                               trans_std=self.trans_std)


class ModulatedDeformRoIPoolingPack(DeformRoIPoolingPack):
    """Adds the per-bin sigmoid modulation mask (ref:
    ModulatedDeformRoIPoolingPack)."""

    @nn.compact
    def __call__(self, feats, rois):
        both = self._offsets(feats, rois, extra_dims=3)
        off, mask_logit = both[..., :2], both[..., 2]
        pooled = deform_roi_pool(feats, rois, off,
                                 pooled_size=self.out_size,
                                 spatial_scale=self.spatial_scale,
                                 sample_num=self.sample_num,
                                 trans_std=self.trans_std)
        return pooled * jax.nn.sigmoid(mask_logit)[..., None]
