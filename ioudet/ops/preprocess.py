"""Fused on-device image preprocessing (north-star item: the reference's
host-side pipeline Resize -> Normalize -> Pad (ref: mmdet/datasets/pipelines/
transforms.py + mmcv imrescale/imnormalize/impad_to_multiple) as ONE jitted
XLA program writing straight to the fixed canvas in HBM).

Takes a uint8 image batch at a fixed source shape, produces the normalized
float canvas + img_meta scalars.  Bilinear resize matches cv2/PIL
half-pixel-center sampling.  Because output shapes are static, the whole
thing compiles once and runs at memory bandwidth.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def _resize_bilinear_hpc(img: jnp.ndarray, out_h: int, out_w: int,
                         src_h, src_w) -> jnp.ndarray:
    """Half-pixel-center bilinear resize of the valid (src_h, src_w) region
    of ``img`` onto a static (out_h, out_w) grid.  src_h/src_w may be traced
    scalars — the gather grid is computed from them, shapes stay static."""
    h, w, _ = img.shape
    sy = src_h / out_h
    sx = src_w / out_w
    ys = (jnp.arange(out_h) + 0.5) * sy - 0.5
    xs = (jnp.arange(out_w) + 0.5) * sx - 0.5
    ys = jnp.clip(ys, 0.0, src_h - 1.0)
    xs = jnp.clip(xs, 0.0, src_w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, jnp.asarray(h - 1))
    x1 = jnp.minimum(x0 + 1, jnp.asarray(w - 1))
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    f = img.astype(jnp.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


@partial(jax.jit, static_argnames=("canvas", "max_scale", "flip_channels"))
def preprocess(img: jnp.ndarray, src_shape: jnp.ndarray,
               canvas: Tuple[int, int] = (832, 1344),
               max_scale: Tuple[int, int] = (1333, 800),
               mean: Tuple[float, ...] = IMAGENET_MEAN,
               std: Tuple[float, ...] = IMAGENET_STD,
               flip_channels: bool = False):
    """img: (H, W, 3) uint8 buffer (content in the top-left (src_h, src_w));
    src_shape: (2,) actual content size.  Returns (canvas float32 image,
    img_shape (2,) int32, scale_factor () float32).

    Keep-ratio factor = min(long/max(h,w), short/min(h,w)) like the
    reference; the resized content lands at the canvas origin, zeros
    elsewhere (after normalization the pad region holds -mean/std of zero
    pixels? No — pad is written AFTER normalize as true zeros, matching
    Pad(pad_val=0) on normalized images in the reference pipeline).
    """
    if flip_channels:  # raw cv2/BGR buffers -> RGB, fused into the resize
        img = img[..., ::-1]
    src_h = src_shape[0].astype(jnp.float32)
    src_w = src_shape[1].astype(jnp.float32)
    long_t, short_t = float(max(max_scale)), float(min(max_scale))
    factor = jnp.minimum(long_t / jnp.maximum(src_h, src_w),
                         short_t / jnp.minimum(src_h, src_w))
    new_h = jnp.round(src_h * factor).astype(jnp.int32)
    new_w = jnp.round(src_w * factor).astype(jnp.int32)

    ch, cw = canvas
    # resize onto the full canvas grid scaled for the valid region, then
    # mask out beyond (new_h, new_w)
    resized = _resize_bilinear_hpc(
        img, ch, cw,
        src_h * (ch / jnp.maximum(new_h, 1)),
        src_w * (cw / jnp.maximum(new_w, 1)))
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    norm = (resized - m) / s
    row = jnp.arange(ch)[:, None] < new_h
    col = jnp.arange(cw)[None, :] < new_w
    out = norm * (row & col)[..., None]
    return out, jnp.stack([new_h, new_w]), factor


def preprocess_batch(imgs: jnp.ndarray, src_shapes: jnp.ndarray,
                     canvas: Tuple[int, int] = (832, 1344),
                     max_scale: Tuple[int, int] = (1333, 800),
                     mean: Tuple[float, ...] = IMAGENET_MEAN,
                     std: Tuple[float, ...] = IMAGENET_STD,
                     flip_channels: bool = False):
    """vmapped batch variant: imgs (B, H, W, 3) uint8 + src_shapes (B, 2)."""
    fn = lambda im, ss: preprocess(im, ss, canvas=canvas, max_scale=max_scale,
                                   mean=mean, std=std,
                                   flip_channels=flip_channels)
    return jax.vmap(fn)(imgs, src_shapes)
