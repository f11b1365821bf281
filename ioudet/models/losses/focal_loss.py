"""Sigmoid focal loss.

The reference ships a fused CUDA kernel purely to avoid materializing the
one-hot + intermediates (ref: mmdet/ops/sigmoid_focal_loss/ +
mmdet/models/losses/focal_loss.py (py_sigmoid_focal_loss, FocalLoss)).
On TPU a pure jnp expression is the right design: XLA fuses the one-hot,
sigmoid, power and BCE into a single VPU loop — no custom kernel, no extra
HBM traffic.  Numerics match the reference's python fallback exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..registry import LOSSES
from .utils import weight_reduce_loss


def _focal_formula(pred: jnp.ndarray, target: jnp.ndarray,
                   gamma: float, alpha: float) -> jnp.ndarray:
    p = jax.nn.sigmoid(pred)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_weight = (alpha * target + (1.0 - alpha) * (1.0 - target)) * pt ** gamma
    # numerically stable BCE-with-logits: max(x,0) - x*t + log(1+exp(-|x|))
    bce = jnp.maximum(pred, 0.0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return bce * focal_weight


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _focal_elem(pred, target, gamma, alpha):
    return _focal_formula(pred, target, gamma, alpha)


def _focal_elem_fwd(pred, target, gamma, alpha):
    return _focal_formula(pred, target, gamma, alpha), (pred, target)


def _focal_elem_bwd(gamma, alpha, res, g):
    # Hand-derived backward recomputing the elementwise chain from (x, t)
    # with ONE exp (autodiff re-emits three transcendental subchains):
    # measured on v5e at the train-step shape (8, 210k, 80) this is
    # 12.9 ms fwd+bwd vs 16.9 autodiff.  d/dt is not provided (targets are
    # detached labels/IoU values everywhere in this framework, as in the
    # reference CUDA op, whose backward is also d/dx only).
    x, t = res
    e = jnp.exp(-jnp.abs(x))
    p = jnp.where(x >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
    pt = t + p * (1.0 - 2.0 * t)
    wa = alpha * t + (1.0 - alpha) * (1.0 - t)
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(e)
    dbce = p - t
    dfw = wa * gamma * pt ** (gamma - 1.0) * (1.0 - 2.0 * t) * p * (1.0 - p)
    dx = g * (wa * pt ** gamma * dbce + bce * dfw)
    return dx, jnp.zeros_like(t)


_focal_elem.defvjp(_focal_elem_fwd, _focal_elem_bwd)


def sigmoid_focal_loss_with_logits(pred: jnp.ndarray, target: jnp.ndarray,
                                   gamma: float = 2.0, alpha: float = 0.25) -> jnp.ndarray:
    """Elementwise focal loss; ``target`` is {0,1} one-hot-style, same shape.

    loss = FW * BCE(pred, target),
    FW   = (alpha*t + (1-alpha)*(1-t)) * pt**gamma,
    pt   = (1-p)*t + p*(1-t).

    Forward is the reference's exact python-fallback formula; backward is a
    hand-derived custom_vjp (see ``_focal_elem_bwd``) — values bit-match the
    straightforward expression, the gradient matches autodiff to float
    roundoff but runs ~25% faster at detection-training shapes.
    """
    return _focal_elem(pred.astype(jnp.float32), target.astype(jnp.float32),
                       gamma, alpha)


def _focal_dx(x, t, gamma, alpha):
    """d(focal)/dx recomputed from (x, t) with ONE exp (see _focal_elem_bwd)."""
    e = jnp.exp(-jnp.abs(x))
    p = jnp.where(x >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
    pt = t + p * (1.0 - 2.0 * t)
    wa = alpha * t + (1.0 - alpha) * (1.0 - t)
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(e)
    dbce = p - t
    dfw = wa * gamma * pt ** (gamma - 1.0) * (1.0 - 2.0 * t) * p * (1.0 - p)
    return wa * pt ** gamma * dbce + bce * dfw


def _level_onehot(labels, b, h, w, A, C):
    lab = labels.reshape(b, h, w, A)
    return ((lab[..., None] - 1 == jnp.arange(C, dtype=lab.dtype))
            & (lab[..., None] > 0)).astype(jnp.float32)


def _fused_focal_sum_impl(logits, labels, lw, gamma, alpha, A):
    b, h, w, AC = logits.shape
    C = AC // A
    x = logits.astype(jnp.float32).reshape(b, h, w, A, C)
    t = _level_onehot(labels, b, h, w, A, C)
    per_anchor = jnp.sum(_focal_formula(x, t, gamma, alpha), axis=-1)
    return jnp.sum(per_anchor * lw.reshape(b, h, w, A))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_level_focal_sum(logits, labels, lw, gamma, alpha, num_anchors):
    """Weighted focal-loss SUM over one FPN level's conv output, consumed in
    place (ref: the fused CUDA sigmoid_focal_loss kernel's raison d'etre).

    logits: (B, H, W, A*C) level output (any float dtype — f32 math inside);
    labels: (B, H*W*A) int32, 0 = bg / 1..C fg; lw: (B, H*W*A) f32 weights.

    The one-hot target is rebuilt INLINE from the int labels in BOTH passes,
    so neither the (B, H, W, A*C) target, the per-element loss, nor the
    weight broadcast is ever materialized to HBM, and the custom_vjp
    residuals are just the inputs (labels are 360x smaller than the one-hot
    they encode).  Values match sum(sigmoid_focal_loss_with_logits * w)
    exactly (same formula, same f32 math; only the reduction order differs);
    the gradient matches autodiff to float roundoff.
    """
    return _fused_focal_sum_impl(logits, labels, lw, gamma, alpha,
                                 num_anchors)


def _fused_focal_fwd(logits, labels, lw, gamma, alpha, A):
    """Eager-backward forward: the loss and its (unscaled) d/dx share one
    exp + one log1p, and dx is stashed as the residual — the plain
    recompute-in-bwd scheme pays the transcendental chain TWICE (4 ops per
    element across fwd+bwd vs 2 here), and the focal term is VPU
    transcendental-bound, not bandwidth-bound (the extra residual write is
    ~0.3 ms at the train shape vs ~6 ms of recomputed exp/log1p).  The bwd
    cotangent of a SUM output is a scalar, so bwd is just g * dx."""
    b, h, w, AC = logits.shape
    C = AC // A
    x = logits.astype(jnp.float32).reshape(b, h, w, A, C)
    t = _level_onehot(labels, b, h, w, A, C)
    lwr = lw.reshape(b, h, w, A)
    e = jnp.exp(-jnp.abs(x))
    p = jnp.where(x >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
    pt = t + p * (1.0 - 2.0 * t)
    wa = alpha * t + (1.0 - alpha) * (1.0 - t)
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(e)
    fw = wa * pt ** gamma
    loss = jnp.sum(jnp.sum(fw * bce, axis=-1) * lwr)
    dbce = p - t
    dfw = wa * gamma * pt ** (gamma - 1.0) * (1.0 - 2.0 * t) * p * (1.0 - p)
    dx = (fw * dbce + bce * dfw) * lwr[..., None]
    return loss, (dx.reshape(b, h, w, AC).astype(logits.dtype),
                  labels[:, :0], lw[:, :0])


def _fused_focal_bwd(gamma, alpha, A, res, g):
    dx, labels0, lw0 = res          # labels0/lw0: empty dtype carriers
    b, h, w, AC = dx.shape
    n = h * w * A
    return ((g * dx.astype(jnp.float32)).astype(dx.dtype),
            jnp.zeros((b, n), labels0.dtype), jnp.zeros((b, n), lw0.dtype))


fused_level_focal_sum.defvjp(_fused_focal_fwd, _fused_focal_bwd)


def sigmoid_focal_loss(pred: jnp.ndarray, labels: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       gamma: float = 2.0, alpha: float = 0.25,
                       reduction: str = "mean",
                       avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Integer-label form matching the reference CUDA op's contract:
    pred (N, C) logits over C foreground classes; labels (N,) with 0 = bg and
    1..C = foreground; per-sample ``weight`` (N,) broadcast over classes.
    """
    num_classes = pred.shape[-1]
    onehot = jax.nn.one_hot(labels - 1, num_classes, dtype=pred.dtype)
    onehot = jnp.where((labels > 0)[..., None], onehot, 0.0)
    loss = sigmoid_focal_loss_with_logits(pred, onehot, gamma=gamma, alpha=alpha)
    if weight is not None and weight.ndim == loss.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module
class FocalLoss:
    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = "mean",
                 loss_weight: float = 1.0):
        if not use_sigmoid:
            raise NotImplementedError("softmax focal loss is not supported (nor in ref)")
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * sigmoid_focal_loss(
            pred, target, weight, gamma=self.gamma, alpha=self.alpha,
            reduction=reduction, avg_factor=avg_factor)
