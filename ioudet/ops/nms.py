"""Fixed-shape NMS kernels for TPU.

Replaces the reference's CUDA/Cython suppression kernels (ref:
mmdet/ops/nms/src/nms_kernel.cu, nms_cpu.cpp, soft_nms_cpu.pyx; wrapper
mmdet/ops/nms/nms_wrapper.py (nms, soft_nms)) with jittable, static-shape
algorithms — no host round-trips, no dynamic output sizes:

  * :func:`nms` — exact greedy NMS.  Candidates are score-sorted once, the
    (N, N) IoU matrix is computed as one batched op, and suppression runs as a
    ``lax.fori_loop`` over rows (sequential dependence is inherent to greedy
    NMS; each step is an O(N) vector op on the VPU).  For the production
    N=1000-2000 this is microseconds.
  * :func:`soft_nms` — linear/gaussian score decay, same reference results as
    the Cython kernel (iterative argmax form).
  * :func:`matrix_nms` — parallel soft suppression (no sequential loop at
    all); the speed-of-light fast path when exact-greedy parity isn't needed.

All return masks/padded arrays instead of compacted lists; invalid slots are
score 0 / label -1.  IoU uses the reference's +1 pixel convention.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.bbox.geometry import bbox_overlaps

NEG_INF = jnp.float32(-1e10)


def _sort_by_score(boxes: jnp.ndarray, scores: jnp.ndarray,
                   valid: Optional[jnp.ndarray]):
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    return boxes[order], scores[order], order


def greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray,
                    iou_thr: float) -> jnp.ndarray:
    """EXACT greedy NMS over a score-descending (N, N) IoU matrix, as a
    fixed-point iteration instead of an N-step scalar loop.

    Greedy NMS is the unique fixed point of
        kept[j] = valid[j] and not any_i (i < j and kept[i] and iou[i,j] > thr).
    Jacobi-iterating this recurrence converges in at most the depth of the
    suppression chain (score-ordered prefixes become exact monotonically),
    which for real detections is ~5-20 — each sweep is ONE (N, N) masked
    reduce on the VPU rather than N sequential scalar steps, so this is
    ~100x fewer serial steps than the reference CUDA kernel's host loop
    (ref: mmdet/ops/nms/src/nms_kernel.cu builds a bitmask then reduces on
    host; here everything stays on-chip).  A ``while_loop`` with an N-sweep
    cap guarantees exactness in the adversarial worst case.
    """
    n = iou.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    supp = (iou > iou_thr) & (col > row)  # i (higher) suppresses j (lower)

    def cond(state):
        suppressed, prev, it = state
        return jnp.logical_and(it < n, jnp.any(suppressed != prev))

    def body(state):
        suppressed, _, it = state
        kept = valid & jnp.logical_not(suppressed)
        new = jnp.any(supp & kept[:, None], axis=0)
        return new, suppressed, it + 1

    init_suppressed = jnp.any(supp & valid[:, None], axis=0)
    state = (init_suppressed, jnp.ones((n,), bool), jnp.int32(0))
    suppressed, _, _ = jax.lax.while_loop(cond, body, state)
    return jnp.logical_not(suppressed) & valid


def greedy_suppress_sequential(iou: jnp.ndarray, valid: jnp.ndarray,
                               iou_thr: float) -> jnp.ndarray:
    """Reference N-step sequential formulation (kept as the oracle the
    fixed-point version is tested against)."""
    n = iou.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    supp = (iou > iou_thr) & (col > row)

    def body(i, suppressed):
        keep_i = jnp.logical_not(suppressed[i]) & valid[i]
        return suppressed | (supp[i] & keep_i)

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))
    return jnp.logical_not(suppressed) & valid


@partial(jax.jit, static_argnames=("iou_thr",))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thr: float,
        valid: Optional[jnp.ndarray] = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS.

    boxes (N, 4), scores (N,), optional valid (N,) bool.
    Returns (dets (N, 5) score-sorted, keep (N,) bool, order (N,) int32).
    Callers slice/compact on host or keep masks on device.
    """
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)
    b, s, order = _sort_by_score(boxes, scores, valid)
    v = s > NEG_INF / 2
    iou = bbox_overlaps(b, b)
    keep = greedy_suppress(iou, v, iou_thr)
    dets = jnp.concatenate([b, s[:, None]], axis=-1)
    return dets, keep, order


@partial(jax.jit, static_argnames=("method", "iou_thr", "sigma", "min_score"))
def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thr: float = 0.3,
             method: str = "linear", sigma: float = 0.5,
             min_score: float = 1e-3,
             valid: Optional[jnp.ndarray] = None):
    """Soft-NMS (ref: soft_nms_cpu.pyx semantics).

    Iteratively selects the current-max-score box and decays the scores of
    all unselected boxes by ``1 - IoU`` (linear, only when IoU > thr) or
    ``exp(-IoU^2 / sigma)`` (gaussian).  Scores below ``min_score`` drop out.
    Returns (dets (N, 5) in selection order, keep (N,) bool, order (N,) int32
    mapping back into the input).
    """
    assert method in ("linear", "gaussian", "naive")
    n = scores.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    cur = jnp.where(valid, scores, NEG_INF)
    iou_all = bbox_overlaps(boxes, boxes)

    def body(t, state):
        cur, sel_order, sel_scores, selected = state
        i = jnp.argmax(cur)
        ok = cur[i] > jnp.float32(min_score)
        sel_order = sel_order.at[t].set(jnp.where(ok, i, -1))
        sel_scores = sel_scores.at[t].set(jnp.where(ok, cur[i], 0.0))
        selected = selected | (ok & (jnp.arange(n) == i))
        iou_i = iou_all[i]
        if method == "linear":
            decay = jnp.where(iou_i > iou_thr, 1.0 - iou_i, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(iou_i * iou_i) / sigma)
        else:  # naive == hard suppression expressed as decay
            decay = jnp.where(iou_i > iou_thr, 0.0, 1.0)
        newscores = cur * decay
        cur = jnp.where(selected | ~ok, jnp.where(selected, NEG_INF, cur), newscores)
        cur = cur.at[i].set(NEG_INF)
        return cur, sel_order, sel_scores, selected

    init = (cur, jnp.full((n,), -1, jnp.int32), jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), dtype=bool))
    _, sel_order, sel_scores, selected = jax.lax.fori_loop(0, n, body, init)
    safe = jnp.clip(sel_order, 0, n - 1)
    dets = jnp.concatenate([boxes[safe], sel_scores[:, None]], axis=-1)
    keep = sel_order >= 0
    return dets, keep, sel_order


@partial(jax.jit, static_argnames=("method", "sigma"))
def matrix_nms(boxes: jnp.ndarray, scores: jnp.ndarray, sigma: float = 2.0,
               method: str = "gaussian",
               valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Matrix-NMS: fully parallel soft suppression (no sequential loop).

    decay_j = min_i [ f(iou_ij) / f(max_k iou_kj over higher-scored k) ]
    over higher-scored i.  Returns decayed scores aligned with the input.
    This is the TPU fast path: one IoU matmul-shaped op + reductions.
    """
    n = scores.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    s = jnp.where(valid, scores, 0.0)
    order = jnp.argsort(-s)
    b, ss = boxes[order], s[order]
    iou = bbox_overlaps(b, b)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    upper = col > row  # i (row) higher-scored than j (col)
    iou_hi = jnp.where(upper, iou, 0.0)          # (i, j): iou of j with higher i
    comp = jnp.max(iou_hi, axis=0)               # per-i max overlap with its own higher
    comp_mat = jnp.where(upper, comp[:, None], 0.0)
    if method == "gaussian":
        decay = jnp.exp(-(iou_hi ** 2 - comp_mat ** 2) / sigma)
    else:
        decay = (1.0 - iou_hi) / jnp.maximum(1.0 - comp_mat, 1e-10)
    decay = jnp.where(upper, decay, 1.0)
    decay = jnp.min(decay, axis=0)
    out_sorted = ss * decay
    inv = jnp.argsort(order)
    return out_sorted[inv]
