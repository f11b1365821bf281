"""Cross-entropy family (ref: mmdet/models/losses/cross_entropy_loss.py
(cross_entropy, binary_cross_entropy, CrossEntropyLoss)).

``binary_cross_entropy`` with a float target in [0,1] is the IoU-prediction
branch's training loss (positives only, avg_factor=num_pos).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES
from .utils import weight_reduce_loss


def cross_entropy(pred, label, weight=None, reduction="mean", avg_factor=None):
    """Softmax CE over logits (N, C) with int labels (N,)."""
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, label[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy_with_logits(pred, target):
    """Stable elementwise BCE over logits; target may be soft (float in [0,1])."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.maximum(pred, 0.0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def _expand_binary_labels(labels, weight, channels: int):
    """Int class labels (N,) -> per-channel binary targets (N, C) with
    channel ``label-1`` hot for labels >= 1 (ref: cross_entropy_loss.py
    (_expand_binary_labels)); weights broadcast across channels."""
    one_hot = jax.nn.one_hot(labels.astype(jnp.int32) - 1, channels,
                             dtype=jnp.float32)
    if weight is not None and weight.ndim < 2:
        weight = jnp.broadcast_to(weight[:, None], one_hot.shape)
    return one_hot, weight


def binary_cross_entropy(pred, target, weight=None, reduction="mean", avg_factor=None):
    if pred.ndim != target.ndim:
        # RPN-style int labels against (N, C) sigmoid logits: without the
        # expansion pred (N,1) x target (N,) would broadcast to (N,N)
        target, weight = _expand_binary_labels(target, weight, pred.shape[-1])
    loss = binary_cross_entropy_with_logits(pred, target)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module
class CrossEntropyLoss:
    def __init__(self, use_sigmoid: bool = False, use_mask: bool = False,
                 reduction: str = "mean", loss_weight: float = 1.0):
        if use_mask:
            raise NotImplementedError("mask CE is two-stage machinery (roadmap)")
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        fn = binary_cross_entropy if self.use_sigmoid else cross_entropy
        return self.loss_weight * fn(pred, target, weight,
                                     reduction=reduction, avg_factor=avg_factor)
