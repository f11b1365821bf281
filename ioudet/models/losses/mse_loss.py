"""MSE loss (ref: mmdet/models/losses/mse_loss.py)."""

import jax.numpy as jnp

from ..registry import LOSSES
from .utils import weighted_loss


@weighted_loss
def mse_loss(pred, target):
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return d * d


@LOSSES.register_module
class MSELoss:
    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * mse_loss(pred, target, weight,
                                           reduction=reduction,
                                           avg_factor=avg_factor)
