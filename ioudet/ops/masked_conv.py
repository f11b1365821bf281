"""Masked conv2d (ref: mmdet/ops/masked_conv/src/masked_conv2d_kernel.cu +
masked_conv.py (MaskedConv2d)) — used by Guided Anchoring heads.

The CUDA kernel gathers masked positions into a dense im2col buffer to skip
computation at masked-out locations.  On TPU sparse gather is slower than
dense compute, so the right design is dense conv + where-mask — identical
outputs, MXU-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def masked_conv2d(x: jnp.ndarray, kernel: jnp.ndarray, mask: jnp.ndarray,
                  bias: jnp.ndarray | None = None,
                  stride: int = 1, padding: str | int = "SAME") -> jnp.ndarray:
    """x (B, H, W, Cin) NHWC; kernel (kh, kw, Cin, Cout); mask (B, H', W')
    boolean/float over OUTPUT positions."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    out = lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out * mask[..., None].astype(out.dtype)
