"""Gradient-harmonizing losses (ref: mmdet/models/losses/ghm_loss.py (GHMC, GHMR)).

Fixed-bin histograms vectorize cleanly on TPU: the per-example gradient-norm
bucketing is a one-hot matmul instead of the reference's in-place masked
updates.  ``momentum`` (EMA of bin counts) is stateful in the reference; here
the EMA state must be threaded explicitly if used (default 0 = stateless).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES
from .cross_entropy_loss import binary_cross_entropy_with_logits


@LOSSES.register_module
class GHMC:
    """GHM classification loss over logits (N, C) with one-hot targets."""

    def __init__(self, bins: int = 10, momentum: float = 0.0,
                 use_sigmoid: bool = True, loss_weight: float = 1.0):
        if not use_sigmoid:
            raise NotImplementedError
        self.bins = bins
        self.momentum = momentum
        self.loss_weight = loss_weight
        edges = jnp.arange(bins + 1, dtype=jnp.float32) / bins
        self.edges = edges.at[-1].add(1e-6)

    def __call__(self, pred, target, label_weight, avg_factor=None,
                 reduction_override=None):
        target = target.astype(jnp.float32)
        label_weight = label_weight.astype(jnp.float32)
        g = jnp.abs(jax.nn.sigmoid(pred) - target)  # gradient norm proxy
        valid = label_weight > 0
        tot = jnp.maximum(jnp.sum(valid), 1.0)

        # bin index per element; counts via segment-sum-style one-hot reduce
        idx = jnp.clip((g * self.bins).astype(jnp.int32), 0, self.bins - 1)
        onehot = jax.nn.one_hot(idx, self.bins, dtype=jnp.float32)
        counts = jnp.sum(onehot * valid[..., None].astype(jnp.float32),
                         axis=tuple(range(onehot.ndim - 1)))  # (bins,)
        nonempty = counts > 0
        n = jnp.sum(nonempty)
        gd = jnp.where(nonempty, tot / jnp.maximum(counts, 1.0), 0.0)
        weights = jnp.sum(onehot * gd, axis=-1) * valid
        weights = weights / jnp.maximum(n, 1.0)
        loss = binary_cross_entropy_with_logits(pred, target) * weights
        return self.loss_weight * jnp.sum(loss) / tot


@LOSSES.register_module
class GHMCAdapter(object):
    """Adapter matching the AnchorHead loss contract (int labels, per-anchor
    weight, avg_factor) on top of GHMC's one-hot interface."""

    def __init__(self, bins: int = 10, momentum: float = 0.0,
                 loss_weight: float = 1.0):
        self.ghmc = None
        self._kw = dict(bins=bins, momentum=momentum, loss_weight=loss_weight)

    def __call__(self, pred, labels, weight=None, avg_factor=None,
                 reduction_override=None):
        if self.ghmc is None:
            self.ghmc = GHMC(**self._kw)
        C = pred.shape[-1]
        onehot = jax.nn.one_hot(labels - 1, C, dtype=pred.dtype)
        onehot = jnp.where((labels > 0)[..., None], onehot, 0.0)
        lw = jnp.ones_like(pred) if weight is None else \
            jnp.broadcast_to(weight[..., None], pred.shape)
        return self.ghmc(pred, onehot, lw)


@LOSSES.register_module
class GHMRAdapter(object):
    """AnchorHead-contract adapter for GHMR (ignores avg_factor: GHM
    normalizes by valid count, like the reference)."""

    def __init__(self, mu: float = 0.02, bins: int = 10,
                 momentum: float = 0.0, loss_weight: float = 1.0):
        self.ghmr = GHMR(mu=mu, bins=bins, momentum=momentum,
                         loss_weight=loss_weight)

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        lw = jnp.ones_like(pred) if weight is None else weight
        return self.ghmr(pred, target, lw)


@LOSSES.register_module
class GHMR:
    """GHM regression loss (ASL1) over (N, 4) deltas."""

    def __init__(self, mu: float = 0.02, bins: int = 10, momentum: float = 0.0,
                 loss_weight: float = 1.0):
        self.mu = mu
        self.bins = bins
        self.loss_weight = loss_weight
        edges = jnp.arange(bins + 1, dtype=jnp.float32) / bins
        self.edges = edges.at[-1].set(1e3)

    def __call__(self, pred, target, label_weight, avg_factor=None,
                 reduction_override=None):
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        g = jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff))
        valid = label_weight > 0
        tot = jnp.maximum(jnp.sum(valid), 1.0)
        idx = jnp.clip((g * self.bins).astype(jnp.int32), 0, self.bins - 1)
        onehot = jax.nn.one_hot(idx, self.bins, dtype=jnp.float32)
        counts = jnp.sum(onehot * valid[..., None].astype(jnp.float32),
                         axis=tuple(range(onehot.ndim - 1)))
        nonempty = counts > 0
        n = jnp.sum(nonempty)
        gd = jnp.where(nonempty, tot / jnp.maximum(counts, 1.0), 0.0)
        weights = jnp.sum(onehot * gd, axis=-1) * valid
        weights = weights / jnp.maximum(n, 1.0)
        return self.loss_weight * jnp.sum(loss * weights) / tot
