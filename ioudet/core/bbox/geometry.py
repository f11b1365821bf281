"""IoU / IoF box overlaps (ref: mmdet/core/bbox/geometry.py (bbox_overlaps)).

Keeps the v1 "+1 pixel" area convention: ``area = (x2 - x1 + 1) * (y2 - y1 + 1)``.
Pure jnp, fixed-shape.  The ``is_aligned=True`` path is what the IoU-aware
head's training target uses; the pairwise path is the assigner's hot spot
(A x G matrix, vectorized — no host loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_small(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for a SMALL table (G rows, G <= a few hundred) and a
    large index vector, as a one-hot matmul instead of a gather.

    XLA:TPU lowers small-table gathers with a huge index axis to a
    pathologically slow loop (~8 ms for 210k x 4 from a 32-row table on
    v5e, measured); ``one_hot @ table`` rides the MXU and costs ~0.5 ms.
    Exact for values representable in fp32 (box coords, small int labels):
    precision=HIGHEST is REQUIRED — the TPU MXU's default precision
    multiplies in bf16, which rounds table values to 8 mantissa bits
    (caught on the real chip by tools/verify_on_tpu.py: ~5e-3 relative
    error on fetched gt boxes); HIGHEST's bf16x6 decomposition carries all
    24 fp32 mantissa bits, and a 0/1 one-hot times an exact 3-term split
    reproduces each table value bit-exactly.

    table: (G,) or (G, C); idx: (..., A) int in [0, G).
    Returns table.dtype, shape idx.shape (+ (C,) if table is 2-D).
    """
    squeeze = table.ndim == 1
    t2 = table[:, None] if squeeze else table
    oh = jax.nn.one_hot(idx, t2.shape[0], dtype=jnp.float32)
    out = jnp.matmul(oh, t2.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    if jnp.issubdtype(table.dtype, jnp.integer):
        out = jnp.round(out)
    out = out.astype(table.dtype)
    return out[..., 0] if squeeze else out


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
