"""Pallas TPU kernels for the fused focal classification loss —
**kept as a measured NEGATIVE result; the jnp path stays the default.**

Hypothesis (from tools/probe_loss_parts.py stage differences): XLA leaves
~10+ ms/step of materialized (B, H, W, A, C) f32 intermediates in the focal
chain.  These kernels hold one (rows, C) logits block in VMEM, rebuild the
one-hot target *in registers* from a (rows, 1) label column, run the whole
chain in f32 registers, and emit only partial sums (fwd) / the bf16 dx
(bwd) — the theoretical floor of one logits read per pass.

Measurement (v5e, dispatch amortized over 8 chained P3-shaped calls inside
ONE program — /tmp-style A/B probe, 2026-08-19): per-focal cost at
(8, 104, 168, 9x80):

    XLA jnp path (fused_level_focal_sum)  3.89 ms
    this kernel, ROWS=512                 5.37 ms
    this kernel, ROWS=2048                5.80 ms  (4096: VMEM OOM)

i.e. **XLA already fuses the focal chain to near its roofline** and beats
Mosaic here (the stage-difference attribution that suggested 15.5 ms had
±3 ms cross-program noise; the chained A/B is the trustworthy number).
Likely Mosaic losses: 80-of-128 lane occupancy on the C dim and per-grid-
step overheads that XLA's fusion into the producer conv avoids entirely.
Same conclusion as the int8 MXU probe (docs/MODEL_ZOO.md): the XLA
elementwise fuser is not the place to spend kernel effort on this chip.

Kept because (a) the exactness tests pin a working Mosaic reduction
pattern (register one-hot, full-tile scalar accumulate, SMEM cotangent),
(b) future toolchains may change the verdict — re-run tools/
probe_focal_ab.py to re-decide.  Semantics are op-for-op the reference
formula (ref: mmdet/ops/sigmoid_focal_loss + mmdet/models/losses/
focal_loss.py (py_sigmoid_focal_loss)); exactness vs the jnp path is
asserted in tests/test_focal_pallas.py (CPU interpret mode + the same
suite on TPU when available).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512          # anchors (rows) per block


def _focal_terms(x, t, lanemask, gamma, alpha):
    """f32 focal chain on one (ROWS, C) block; returns (loss, dx) terms.

    MUST stay op-for-op equal to models/losses/focal_loss.py
    (_focal_formula / _focal_dx) — the exactness tests compare elementwise.
    """
    e = jnp.exp(-jnp.abs(x))
    p = jnp.where(x >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
    pt = t + p * (1.0 - 2.0 * t)
    wa = alpha * t + (1.0 - alpha) * (1.0 - t)
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(e)
    fw = wa * pt ** gamma
    loss = jnp.where(lanemask, fw * bce, 0.0)
    dbce = p - t
    dfw = wa * gamma * pt ** (gamma - 1.0) * (1.0 - 2.0 * t) * p * (1.0 - p)
    dx = jnp.where(lanemask, fw * dbce + bce * dfw, 0.0)
    return loss, dx


def _fwd_kernel(x_ref, lab_ref, lw_ref, out_ref, *, C: int, gamma: float,
                alpha: float):
    """Accumulates sum(lw[r] * focal(x[r, c], t[r, c])) over the whole grid
    into out[0, 0] (the out block revisits the same (8, 128) tile every
    step; the TPU grid is sequential, so += is race-free)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    x = x_ref[:, :].astype(jnp.float32)
    lab = lab_ref[:, :]                               # (ROWS, 1) int32
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    t = ((lane == lab - 1) & (lab > 0)).astype(jnp.float32)
    lanemask = lane < C                               # lane padding (C<128)
    loss, _ = _focal_terms(x, t, lanemask, gamma, alpha)
    # stay 2-D throughout: 1-D vectors get awkward Mosaic layouts
    total = jnp.sum(loss * lw_ref[:, :])
    # scalar stores to VMEM are not lowerable — embed the block total at
    # tile position (0, 0) via a full-tile masked add
    r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_ref[:, :] += jnp.where((r == 0) & (c == 0), total, 0.0)


def _bwd_kernel(g_ref, x_ref, lab_ref, lw_ref, dx_ref, *, C: int,
                gamma: float, alpha: float):
    x = x_ref[:, :].astype(jnp.float32)
    lab = lab_ref[:, :]                               # (ROWS, 1) int32
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    t = ((lane == lab - 1) & (lab > 0)).astype(jnp.float32)
    lanemask = lane < C
    _, dx = _focal_terms(x, t, lanemask, gamma, alpha)
    dx_ref[:, :] = (g_ref[0] * dx * lw_ref[:, :]).astype(dx_ref.dtype)


def _prep(logits, labels, lw, num_anchors):
    """(B,H,W,A*C) logits + (B,HWA) labels/lw -> 2-D row-major views."""
    b, h, w, AC = logits.shape
    C = AC // num_anchors
    n = b * h * w * num_anchors
    x2 = logits.reshape(n, C)
    pad = -n % ROWS
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    lab2 = jnp.pad(labels.reshape(n, 1), ((0, pad), (0, 0)))
    lw2 = jnp.pad(lw.reshape(n, 1), ((0, pad), (0, 0)))
    return x2, lab2, lw2, C, n, (n + pad) // ROWS


@partial(jax.jit, static_argnames=("gamma", "alpha", "num_anchors"))
def focal_level_sum(logits, labels, lw, gamma: float, alpha: float,
                    num_anchors: int):
    """Weighted focal SUM over one level (Pallas).  Same contract as
    models/losses/focal_loss.py::fused_level_focal_sum's primal."""
    x2, lab2, lw2, C, _, nblk = _prep(logits, labels, lw, num_anchors)
    interpret = jax.default_backend() == "cpu"
    acc = pl.pallas_call(
        partial(_fwd_kernel, C=C, gamma=float(gamma), alpha=float(alpha)),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((ROWS, C), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(x2, lab2, lw2)
    return acc[0, 0]


@partial(jax.jit, static_argnames=("gamma", "alpha", "num_anchors"))
def focal_level_dx(g, logits, labels, lw, gamma: float, alpha: float,
                   num_anchors: int):
    """dL/dlogits for focal_level_sum with upstream scalar cotangent g.
    Recomputes the chain from the saved inputs (one read of the bf16
    logits) and writes dx once in the logits dtype."""
    b, h, w, AC = logits.shape
    x2, lab2, lw2, C, n, nblk = _prep(logits, labels, lw, num_anchors)
    interpret = jax.default_backend() == "cpu"
    dx = pl.pallas_call(
        partial(_bwd_kernel, C=C, gamma=float(gamma), alpha=float(alpha)),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # g: (1,) f32
            pl.BlockSpec((ROWS, C), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, C), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], C), logits.dtype),
        interpret=interpret,
    )(jnp.reshape(g.astype(jnp.float32), (1,)), x2, lab2, lw2)
    return dx[:n].reshape(b, h, w, AC)
