"""Loss weighting/reduction helpers (ref: mmdet/models/losses/utils.py
(weight_reduce_loss, weighted_loss)).

The ``avg_factor`` convention is load-bearing for parity: detection losses
normalize by the number of positive samples, NOT by the number of elements.
With ``avg_factor`` given and reduction='mean', the loss is
``sum(loss * weight) / avg_factor``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp


def reduce_loss(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"invalid reduction {reduction}")


def weight_reduce_loss(loss: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
                       reduction: str = "mean",
                       avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == "mean":
        return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)
    if reduction == "none":
        return loss
    raise ValueError("avg_factor is not compatible with reduction='sum'")


def weighted_loss(loss_fn):
    """Decorator turning an elementwise ``f(pred, target, **kw)`` into the full
    ``f(pred, target, weight, reduction, avg_factor, **kw)`` signature."""

    @functools.wraps(loss_fn)
    def wrapper(pred, target, weight=None, reduction="mean", avg_factor=None, **kwargs):
        loss = loss_fn(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)

    return wrapper
