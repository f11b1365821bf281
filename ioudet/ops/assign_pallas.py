"""Pallas TPU kernel for fused anchor-target assignment.

The XLA path (`core/anchor/anchor_target.py`) expresses MaxIoU assignment as
(G, A) matrix ops: the IoU matrix is consumed by four separate reductions
(max/argmax over gts, per-gt max over anchors, the forced-positive hit max)
plus a one-hot matmul for the matched-gt lookup — each consumer either
rematerializes the (G, A) producer or spills it to HBM, and the profile
charges ~11 ms of a 120 ms train step to assignment alone
(tools/probe_assign.py), ~5x its bandwidth roofline.

This kernel recomputes the IoU **in registers** per (gt, anchor-block) pair
and carries the running max / argmax / forced-positive / matched-gt values
through a G-step loop, so HBM traffic is exactly: anchors read twice
(~27 MB at the flagship shape) + the per-anchor outputs written once
(~94 MB) — nothing G-sized ever hits HBM.  Two passes because the
reference's step-4 rule ("every anchor tying a gt's best IoU is forced
positive", ref: mmdet/core/bbox/assigners/max_iou_assigner.py
(assign_wrt_overlaps)) needs each gt's global max before any anchor can be
finalized:

  pass 1  gt_max[b, g] = max_a IoU(gt g, anchor a)   (masked)
  pass 2  per anchor: running (max, first-argmax, last-forced) over g,
          then labels / weights / bbox2delta targets in-place.

Both passes compute IoU with the *identical* instruction sequence, so the
`iou == gt_max` tie test is bit-exact between them (same Mosaic lowering).
Semantics match `assign_max_iou` + `anchor_target_single` exactly for the
default path (no sampler, no ignore regions, allowed_border < 0,
gt_max_assign_all=True) — asserted elementwise in
tests/test_assign_pallas.py; everything else falls back to the XLA path.

Anchor planes are passed as four (rows, 128) f32 arrays (x1, y1, x2, y2) —
native (sublane, lane) tiling, no degenerate 4-wide lane dims.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 64          # anchors per block = ROWS * LANES = 8192
_NEG = -2.0        # below the jnp path's masked value (-1.0)


def _iou_block(ax1, ay1, ax2, ay2, area_a, gx1, gy1, gx2, gy2,
               g_valid, av):
    """Masked IoU of one gt (scalars) vs an anchor block (vectors).

    MUST stay textually identical between the two kernels (bit-exact
    tie test) and op-for-op equal to core/bbox/geometry.bbox_overlaps
    (the +1 pixel convention, 1e-10 denom floor, -1.0 mask value).
    """
    iw = jnp.maximum(jnp.minimum(ax2, gx2) - jnp.maximum(ax1, gx1) + 1.0, 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, gy2) - jnp.maximum(ay1, gy1) + 1.0, 0.0)
    overlap = iw * ih
    area_g = (gx2 - gx1 + 1.0) * (gy2 - gy1 + 1.0)
    iou = overlap / jnp.maximum(area_a + area_g - overlap, 1e-10)
    return jnp.where((g_valid > 0.0) & av, iou, -1.0)


def _gtmax_kernel(gt_ref, ax1_ref, ay1_ref, ax2_ref, ay2_ref, valid_ref,
                  out_ref, *, num_gts: int):
    """Pass 1: out[b, g] = max over this image's anchors of masked IoU.

    gt_ref: (1, G, 6) SMEM [x1 y1 x2 y2 label valid];
    a*_ref/valid_ref: (ROWS, LANES) f32; out_ref: (1, 8, LANES) f32 — g in
    the lane dim, all 8 sublanes identical (TPU VMEM blocks need the last
    two dims (8k, 128k); the redundant sublanes are free).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :, :] = jnp.full((1, 8, LANES), _NEG, jnp.float32)

    ax1 = ax1_ref[:, :]
    ay1 = ay1_ref[:, :]
    ax2 = ax2_ref[:, :]
    ay2 = ay2_ref[:, :]
    av = valid_ref[0, :, :] > 0.0
    area_a = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, LANES), 2)
    acc = out_ref[:, :, :]
    for g in range(num_gts):
        iou = _iou_block(ax1, ay1, ax2, ay2, area_a,
                         gt_ref[0, g, 0], gt_ref[0, g, 1],
                         gt_ref[0, g, 2], gt_ref[0, g, 3],
                         gt_ref[0, g, 5], av)
        m = jnp.max(iou)
        acc = jnp.where(lane == g, jnp.maximum(acc, m), acc)
    out_ref[:, :, :] = acc


def _assign_kernel(gt_ref, gtmax_ref,
                   ax1_ref, ay1_ref, ax2_ref, ay2_ref, valid_ref,
                   labels_ref, lw_ref, posf_ref,
                   dx_ref, dy_ref, dw_ref, dh_ref,
                   mx1_ref, my1_ref, mx2_ref, my2_ref,
                   *, num_gts: int, pos_iou_thr: float, neg_iou_thr: float,
                   min_pos_iou: float, pos_weight: float,
                   means: tuple, stds: tuple):
    """Pass 2: finalize one anchor block.

    gtmax_ref: (1, 8, LANES) VMEM per-gt maxima from pass 1 (sublanes
    redundant; scalars read with static indices).
    Outputs, all (ROWS, LANES): labels i32 (0 bg / 1..C), label weights,
    positive mask f32, the four bbox2delta target planes (zeroed on
    non-positives) and the four matched-gt planes (idem).
    """
    ax1 = ax1_ref[:, :]
    ay1 = ay1_ref[:, :]
    ax2 = ax2_ref[:, :]
    ay2 = ay2_ref[:, :]
    av = valid_ref[0, :, :] > 0.0
    area_a = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)

    shape = ax1.shape
    max_ov = jnp.full(shape, _NEG, jnp.float32)
    best_g = jnp.zeros(shape, jnp.int32)
    forced_g = jnp.zeros(shape, jnp.int32)
    bx1 = jnp.zeros(shape, jnp.float32)
    by1 = jnp.zeros(shape, jnp.float32)
    bx2 = jnp.zeros(shape, jnp.float32)
    by2 = jnp.zeros(shape, jnp.float32)
    blab = jnp.zeros(shape, jnp.float32)
    fx1 = jnp.zeros(shape, jnp.float32)
    fy1 = jnp.zeros(shape, jnp.float32)
    fx2 = jnp.zeros(shape, jnp.float32)
    fy2 = jnp.zeros(shape, jnp.float32)
    flab = jnp.zeros(shape, jnp.float32)

    for g in range(num_gts):
        gx1 = gt_ref[0, g, 0]
        gy1 = gt_ref[0, g, 1]
        gx2 = gt_ref[0, g, 2]
        gy2 = gt_ref[0, g, 3]
        glab = gt_ref[0, g, 4]
        gval = gt_ref[0, g, 5]
        iou = _iou_block(ax1, ay1, ax2, ay2, area_a,
                         gx1, gy1, gx2, gy2, gval, av)
        # strict > keeps the FIRST maximum (jnp.argmax semantics)
        better = iou > max_ov
        max_ov = jnp.where(better, iou, max_ov)
        best_g = jnp.where(better, g, best_g)
        bx1 = jnp.where(better, gx1, bx1)
        by1 = jnp.where(better, gy1, by1)
        bx2 = jnp.where(better, gx2, bx2)
        by2 = jnp.where(better, gy2, by2)
        blab = jnp.where(better, glab, blab)
        # reference step 4: anchors tying this gt's global max are forced
        # positive (later gts overwrite earlier — ascending g, last wins)
        gmax = gtmax_ref[0, 0, g]
        ok = (gval > 0.0) & (gmax >= min_pos_iou)
        hit = (iou == gmax) & ok & av
        forced_g = jnp.where(hit, g + 1, forced_g)
        fx1 = jnp.where(hit, gx1, fx1)
        fy1 = jnp.where(hit, gy1, fy1)
        fx2 = jnp.where(hit, gx2, fx2)
        fy2 = jnp.where(hit, gy2, fy2)
        flab = jnp.where(hit, glab, flab)

    assigned = jnp.full(shape, -1, jnp.int32)
    assigned = jnp.where((max_ov >= 0.0) & (max_ov < neg_iou_thr), 0,
                         assigned)
    assigned = jnp.where(max_ov >= pos_iou_thr, best_g + 1, assigned)
    assigned = jnp.where(forced_g > 0, forced_g, assigned)

    use_f = forced_g > 0
    mx1 = jnp.where(use_f, fx1, bx1)
    my1 = jnp.where(use_f, fy1, by1)
    mx2 = jnp.where(use_f, fx2, bx2)
    my2 = jnp.where(use_f, fy2, by2)
    mlab = jnp.where(use_f, flab, blab)

    pos = assigned > 0
    posf = pos.astype(jnp.float32)
    negf = (assigned == 0).astype(jnp.float32)

    labels_ref[0, :, :] = jnp.where(pos, mlab.astype(jnp.int32), 0)
    lw_ref[0, :, :] = posf * pos_weight + negf
    posf_ref[0, :, :] = posf

    # bbox2delta, op-for-op (core/bbox/transforms.bbox2delta)
    px = (ax1 + ax2) * 0.5
    py = (ay1 + ay2) * 0.5
    pw = ax2 - ax1 + 1.0
    ph = ay2 - ay1 + 1.0
    gx = (mx1 + mx2) * 0.5
    gy = (my1 + my2) * 0.5
    gw = mx2 - mx1 + 1.0
    gh = my2 - my1 + 1.0
    # padded-lane anchors are degenerate (w = h = 1); matched gt for a
    # never-assigned anchor is all-zeros (w = h = 1) — logs stay finite
    dx_ref[0, :, :] = ((gx - px) / pw - means[0]) / stds[0] * posf
    dy_ref[0, :, :] = ((gy - py) / ph - means[1]) / stds[1] * posf
    dw_ref[0, :, :] = (jnp.log(gw / pw) - means[2]) / stds[2] * posf
    dh_ref[0, :, :] = (jnp.log(gh / ph) - means[3]) / stds[3] * posf
    mx1_ref[0, :, :] = mx1 * posf
    my1_ref[0, :, :] = my1 * posf
    mx2_ref[0, :, :] = mx2 * posf
    my2_ref[0, :, :] = my2 * posf


@partial(jax.jit, static_argnames=("pos_iou_thr", "neg_iou_thr",
                                   "min_pos_iou", "pos_weight",
                                   "target_means", "target_stds"))
def fused_anchor_assign(flat_anchors: jnp.ndarray,
                        valid: jnp.ndarray,
                        gt_bboxes: jnp.ndarray,
                        gt_valid: jnp.ndarray,
                        gt_labels: jnp.ndarray,
                        pos_iou_thr: float,
                        neg_iou_thr: float,
                        min_pos_iou: float = 0.0,
                        pos_weight: float = 1.0,
                        target_means: tuple = (0.0, 0.0, 0.0, 0.0),
                        target_stds: tuple = (1.0, 1.0, 1.0, 1.0)):
    """Batched fused anchor-target assignment.

    flat_anchors (A, 4) f32; valid (B, A) bool; gt_bboxes (B, G, 4);
    gt_valid (B, G) bool; gt_labels (B, G) int (1-based).

    Returns (labels (B,A) i32, label_weights (B,A) f32, posf (B,A) f32,
    bbox_targets (B,A,4) f32, pos_gt_boxes (B,A,4) f32) — identical to the
    XLA anchor_target_single outputs for the default (no-sampler) path.
    """
    # reference pos_weight semantics: <= 0 means "weight positives 1.0"
    # (mmdet anchor_target_single's `if cfg.pos_weight <= 0` branch)
    pos_weight = 1.0 if pos_weight <= 0 else float(pos_weight)
    A = flat_anchors.shape[0]
    B, G = gt_valid.shape
    blk = ROWS * LANES
    a_pad = -A % blk
    anchors = jnp.pad(flat_anchors.astype(jnp.float32), ((0, a_pad), (0, 0)))
    validp = jnp.pad(valid.astype(jnp.float32), ((0, 0), (0, a_pad)))
    rows_tot = (A + a_pad) // LANES
    nblk = rows_tot // ROWS

    planes = [anchors[:, k].reshape(rows_tot, LANES) for k in range(4)]
    validp = validp.reshape(B, rows_tot, LANES)
    gt_table = jnp.concatenate(
        [gt_bboxes.astype(jnp.float32),
         gt_labels.astype(jnp.float32)[..., None],
         gt_valid.astype(jnp.float32)[..., None]], axis=-1)     # (B, G, 6)
    assert G <= LANES, f"G={G} must fit in one lane vector ({LANES})"

    interpret = jax.default_backend() == "cpu"
    anchor_spec = pl.BlockSpec((ROWS, LANES), lambda b, j: (j, 0),
                               memory_space=pltpu.VMEM)
    valid_spec = pl.BlockSpec((1, ROWS, LANES), lambda b, j: (b, j, 0),
                              memory_space=pltpu.VMEM)
    gt_spec = pl.BlockSpec((1, G, 6), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.SMEM)

    gtmax = pl.pallas_call(
        partial(_gtmax_kernel, num_gts=G),
        grid=(B, nblk),
        in_specs=[gt_spec] + [anchor_spec] * 4 + [
            pl.BlockSpec((1, ROWS, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, LANES), jnp.float32),
        interpret=interpret,
    )(gt_table, *planes, validp)

    out_2d = lambda dt: jax.ShapeDtypeStruct((B, rows_tot, LANES), dt)
    out_spec = pl.BlockSpec((1, ROWS, LANES), lambda b, j: (b, j, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_assign_kernel, num_gts=G,
                pos_iou_thr=float(pos_iou_thr),
                neg_iou_thr=float(neg_iou_thr),
                min_pos_iou=float(min_pos_iou),
                pos_weight=float(pos_weight),
                means=tuple(float(m) for m in target_means),
                stds=tuple(float(s) for s in target_stds)),
        grid=(B, nblk),
        in_specs=[gt_spec,
                  pl.BlockSpec((1, 8, LANES), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [anchor_spec] * 4 + [valid_spec],
        out_specs=[out_spec] * 11,
        out_shape=[out_2d(jnp.int32)] + [out_2d(jnp.float32)] * 10,
        interpret=interpret,
    )(gt_table, gtmax, *planes, validp)

    unpad = lambda x: x.reshape(B, rows_tot * LANES)[:, :A]
    labels, lw, posf = (unpad(o) for o in outs[:3])
    bt = jnp.stack([unpad(o) for o in outs[3:7]], axis=-1)
    pgb = jnp.stack([unpad(o) for o in outs[7:11]], axis=-1)
    return labels, lw, posf, bt, pgb
