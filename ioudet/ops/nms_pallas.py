"""Pallas TPU kernel for the NMS suppression matrix.

The XLA path materializes a full (N, N) fp32 IoU matrix in HBM (16 MB at
N=2000) and then reduces it ~10x in the fixed-point sweeps.  This kernel
fuses IoU + threshold + strict-upper-triangle into ONE pass producing the
float 0/1 suppression matrix tile-by-tile in VMEM — the box coordinates
(N x 4) stay resident in VMEM, so HBM traffic drops from
(8 intermediates + matrix) to just the output matrix.

Tiles are (128, 128) on the (sublane, lane) grid; N must be padded to a
multiple of 128 by the caller (fixed-shape candidates already are).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _supp_kernel(iou_thr_ref, rows_ref, cols_ref, out_ref):
    """rows_ref: (TILE, 4) boxes for this row tile; cols_ref: (TILE, 4) for
    the col tile; out: (TILE, TILE) float {0, 1} suppression flags."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    thr = iou_thr_ref[0]

    rx1 = rows_ref[:, 0:1]  # (T, 1)
    ry1 = rows_ref[:, 1:2]
    rx2 = rows_ref[:, 2:3]
    ry2 = rows_ref[:, 3:4]
    cx1 = cols_ref[:, 0:1].T  # (1, T)
    cy1 = cols_ref[:, 1:2].T
    cx2 = cols_ref[:, 2:3].T
    cy2 = cols_ref[:, 3:4].T

    iw = jnp.maximum(jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1) + 1.0, 0.0)
    ih = jnp.maximum(jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1) + 1.0, 0.0)
    inter = iw * ih
    ra = (rx2 - rx1 + 1.0) * (ry2 - ry1 + 1.0)
    ca = (cx2 - cx1 + 1.0) * (cy2 - cy1 + 1.0)
    iou = inter / jnp.maximum(ra + ca - inter, 1e-10)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) + i * TILE
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1) + j * TILE
    upper = col_ids > row_ids  # row (higher score) suppresses col (lower)
    out_ref[:, :] = jnp.where((iou > thr) & upper, 1.0, 0.0)


@partial(jax.jit, static_argnames=("iou_thr",))
def suppression_matrix(boxes: jnp.ndarray, iou_thr: float) -> jnp.ndarray:
    """boxes: (N, 4) score-descending, N % 128 == 0.  Returns (N, N) float
    {0,1}: [i, j] = 1 iff i < j and IoU(i, j) > thr."""
    n = boxes.shape[0]
    assert n % TILE == 0, f"N={n} must be a multiple of {TILE}"
    grid = (n // TILE, n // TILE)
    thr = jnp.asarray([iou_thr], jnp.float32)
    interpret = jax.default_backend() == "cpu"  # tests run on the CPU mesh
    return pl.pallas_call(
        _supp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(thr, boxes.astype(jnp.float32), boxes.astype(jnp.float32))


def _greedy_kernel(boxes_ref, boxes_t_ref, valid_ref, keep_ref, sup_scratch,
                   *, iou_thr: float, n: int):
    """Whole greedy NMS in ONE kernel pass: boxes stay VMEM-resident, the
    (128, N) IoU block is computed on the fly per row-block (never hits
    HBM), and the inherently-sequential greedy recurrence runs as a
    128-step inner loop per block with vector-wide suppression updates.

    boxes_ref: (N, 4) f32 score-descending (row-block source);
    boxes_t_ref: (4, N) f32 transpose (lane-layout column source — feeding
    both layouts avoids an in-kernel relayout); valid_ref: (1, N) f32;
    keep_ref: (1, N) f32 out.  N % 128 == 0.
    """
    thr = jnp.float32(iou_thr)
    bt = boxes_ref[:, :]                      # (N, 4)
    x1 = boxes_t_ref[0:1, :]                  # (1, N)
    y1 = boxes_t_ref[1:2, :]
    x2 = boxes_t_ref[2:3, :]
    y2 = boxes_t_ref[3:4, :]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)  # (1, N), +1 convention
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    # invalid boxes start suppressed: they never suppress anyone
    supp = 1.0 - valid_ref[:, :]              # (1, N) f32

    for b in range(n // TILE):
        rows = bt[b * TILE:(b + 1) * TILE, :]  # (128, 4) static slice
        rx1 = rows[:, 0:1]
        ry1 = rows[:, 1:2]
        rx2 = rows[:, 2:3]
        ry2 = rows[:, 3:4]
        iw = jnp.maximum(
            jnp.minimum(rx2, x2) - jnp.maximum(rx1, x1) + 1.0, 0.0)
        ih = jnp.maximum(
            jnp.minimum(ry2, y2) - jnp.maximum(ry1, y1) + 1.0, 0.0)
        inter = iw * ih                        # (128, N)
        rarea = (rx2 - rx1 + 1.0) * (ry2 - ry1 + 1.0)
        iou = inter / jnp.maximum(rarea + area - inter, 1e-10)
        row_g = jax.lax.broadcasted_iota(jnp.int32, (TILE, n), 0) + b * TILE
        col_g = jax.lax.broadcasted_iota(jnp.int32, (TILE, n), 1)
        # stage the block in VMEM scratch: refs support pl.ds row reads in
        # the sequential loop (dynamic_slice on values has no TPU lowering)
        sup_scratch[:, :] = jnp.where((iou > thr) & (col_g > row_g), 1.0, 0.0)

        def inner(i, supp):
            gi = b * TILE + i
            # suppressed-state of row gi, extracted lane-wise
            m = (lane == gi).astype(jnp.float32)
            keep_i = 1.0 - jnp.sum(supp * m)
            sup_i = sup_scratch[pl.ds(i, 1), :]
            return jnp.maximum(supp, sup_i * keep_i)

        supp = jax.lax.fori_loop(0, TILE, inner, supp)

    keep_ref[:, :] = valid_ref[:, :] * (1.0 - supp)


@partial(jax.jit, static_argnames=("iou_thr",))
def greedy_keep_pallas(boxes: jnp.ndarray, valid: jnp.ndarray,
                       iou_thr: float) -> jnp.ndarray:
    """Exact greedy NMS keep mask, single fused kernel.

    boxes: (N, 4) score-descending; valid: (N,) bool.  N is padded to a
    multiple of 128 internally.  Returns keep (N,) bool — bit-identical to
    ops.nms.greedy_suppress over bbox_overlaps (+1 convention) — with no
    HBM-resident (N, N) IoU matrix: the suppression block lives in VMEM.

    Measured on v5e (N=2000, batch 16, uniform random boxes): 11.1 ms vs
    7.1 ms for the XLA fixed-point — the 16x128-step sequential inner loop
    is latency-bound while the Jacobi sweep converges in ~chain-depth
    parallel passes, so the XLA path stays the production default and this
    kernel is opt-in via nms_type='pallas_greedy' (it would win only on
    adversarial deep-chain data where the fixed point needs many sweeps).
    """
    n0 = boxes.shape[0]
    n = -(-n0 // TILE) * TILE
    if n != n0:
        boxes = jnp.pad(boxes, ((0, n - n0), (0, 0)))
        valid = jnp.pad(valid, (0, n - n0))
    interpret = jax.default_backend() == "cpu"
    boxes = boxes.astype(jnp.float32)
    keep = pl.pallas_call(
        partial(_greedy_kernel, iou_thr=float(iou_thr), n=n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, n), jnp.float32)],
        interpret=interpret,
    )(boxes, boxes.T, valid.astype(jnp.float32).reshape(1, n))
    return keep[0, :n0] > 0.5


def greedy_nms_pallas(boxes: jnp.ndarray, valid: jnp.ndarray,
                      iou_thr: float) -> jnp.ndarray:
    """Exact greedy NMS using the Pallas suppression matrix + the fixed-point
    sweep.  boxes score-descending, N % 128 == 0.  Returns keep mask."""
    n = boxes.shape[0]
    supp = suppression_matrix(boxes, iou_thr) > 0.5

    def cond(state):
        suppressed, prev, it = state
        return jnp.logical_and(it < n, jnp.any(suppressed != prev))

    def body(state):
        suppressed, _, it = state
        kept = valid & jnp.logical_not(suppressed)
        new = jnp.any(supp & kept[:, None], axis=0)
        return new, suppressed, it + 1

    init = jnp.any(supp & valid[:, None], axis=0)
    state = (init, jnp.ones((n,), bool), jnp.int32(0))
    suppressed, _, _ = jax.lax.while_loop(cond, body, state)
    return jnp.logical_not(suppressed) & valid
