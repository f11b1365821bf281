"""Balanced L1 (Libra R-CNN) (ref: mmdet/models/losses/balanced_l1_loss.py)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..registry import LOSSES
from .utils import weighted_loss


@weighted_loss
def balanced_l1_loss(pred, target, beta: float = 1.0, alpha: float = 0.5,
                     gamma: float = 1.5):
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    b = math.e ** (gamma / alpha) - 1.0
    return jnp.where(
        diff < beta,
        alpha / b * (b * diff + beta) * jnp.log(b * diff / beta + 1.0) - alpha * diff,
        gamma * diff + gamma / b - alpha * beta)


@LOSSES.register_module
class BalancedL1Loss:
    def __init__(self, alpha: float = 0.5, gamma: float = 1.5, beta: float = 1.0,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * balanced_l1_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor,
            beta=self.beta, alpha=self.alpha, gamma=self.gamma)
