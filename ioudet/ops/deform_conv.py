"""Deformable convolution v1/v2 (ref: mmdet/ops/dcn/src/deform_conv_cuda.cpp,
deform_conv_cuda_kernel.cu (~1800 LoC); wrappers dcn/deform_conv.py
(DeformConv, ModulatedDeformConv)).

TPU-native formulation: the deformable sampling is a batched bilinear gather
producing an im2col-style tensor (B, H, W, K*Cin), and the convolution then
collapses to ONE big matmul with the (K*Cin, Cout)-reshaped kernel — the MXU
path.  Autodiff derives the offset/feature gradients that the reference
hand-writes.  v2 ("modulated") multiplies each sampled tap by a learned mask.

Irregular gather is the cost on TPU (SURVEY flags this); this op is for the
configs/dcn/* breadth, not the IoU-aware critical path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _sample_taps(x: jnp.ndarray, offsets: jnp.ndarray, k: Tuple[int, int],
                 stride: int, dilation: int) -> jnp.ndarray:
    """x (H, W, C); offsets (Ho, Wo, K, 2) as (dy, dx).
    Returns (Ho, Wo, K, C) bilinear-sampled taps at p0 + p_k + Δp_k."""
    h, w, c = x.shape
    kh, kw = k
    ho, wo = offsets.shape[:2]
    pad = (dilation * (kh - 1)) // 2
    base_y = jnp.arange(ho) * stride
    base_x = jnp.arange(wo) * stride
    ky, kx = jnp.meshgrid(jnp.arange(kh), jnp.arange(kw), indexing="ij")
    kyx = jnp.stack([ky, kx], -1).reshape(-1, 2) * dilation - pad  # (K, 2)
    yy = base_y[:, None, None] + kyx[None, None, :, 0] + offsets[..., 0]
    xx = base_x[None, :, None] + kyx[None, None, :, 1] + offsets[..., 1]

    # bilinear with zero padding outside (kernel semantics)
    def gather(yc, xc):
        yi = jnp.clip(yc, 0, h - 1)
        xi = jnp.clip(xc, 0, w - 1)
        return x[yi, xi]

    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    wy = yy - y0
    wx = xx - x0
    out = jnp.zeros((ho, wo, kyx.shape[0], c), x.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            yi, xi = y0 + dy, x0 + dx
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            wgt = ((wy if dy else 1 - wy) * (wx if dx else 1 - wx))
            wgt = jnp.where(inb, wgt, 0.0)
            out = out + gather(yi, xi) * wgt[..., None]
    return out


@partial(jax.jit, static_argnames=("kernel_size", "stride", "dilation",
                                   "groups"))
def deform_conv2d(x: jnp.ndarray, offsets: jnp.ndarray, kernel: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  mask: Optional[jnp.ndarray] = None,
                  kernel_size: Tuple[int, int] = (3, 3), stride: int = 1,
                  dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """x (B, H, W, Cin); offsets (B, Ho, Wo, 2K) interleaved (dy, dx) per tap
    (the reference's channel layout); kernel (kh, kw, Cin, Cout); mask
    (B, Ho, Wo, K) for the modulated (v2) variant."""
    kh, kw = kernel_size
    K = kh * kw
    b, h, w, cin = x.shape
    offs = offsets.reshape(offsets.shape[0], offsets.shape[1],
                           offsets.shape[2], K, 2)

    def one(xi, oi, mi):
        taps = _sample_taps(xi, oi, kernel_size, stride, dilation)  # (Ho,Wo,K,C)
        if mi is not None:
            taps = taps * mi[..., None]
        ho, wo = taps.shape[:2]
        cols = taps.reshape(ho, wo, K * cin)
        wmat = kernel.reshape(K * cin, -1)
        return jnp.dot(cols, wmat, preferred_element_type=jnp.float32)

    if mask is None:
        out = jax.vmap(lambda xi, oi: one(xi, oi, None))(x, offs)
    else:
        out = jax.vmap(one)(x, offs, mask)
    if bias is not None:
        out = out + bias
    return out
