"""Gradient-harmonizing losses (ref: mmdet/models/losses/ghm_loss.py (GHMC, GHMR)).

Fixed-bin histograms vectorize cleanly on TPU: the per-example gradient-norm
bucketing is a one-hot matmul instead of the reference's in-place masked
updates.

``momentum`` (the reference's EMA of per-bin counts, used by every upstream
``configs/ghm/*`` config: GHMC momentum=0.75, GHMR momentum=0.7) is stateful
in the reference (``self.acc_sum`` mutated per forward).  Functionally here:
with momentum > 0 the loss takes the carried ``acc_sum`` and returns
``(loss, new_acc_sum)``; AnchorHead threads it through a flax 'ghm' mutable
collection so the EMA state rides the train state like the reference's
module buffer rides the torch module.  momentum == 0 stays the stateless
single-return path.

Reference update rule, per NON-EMPTY bin i only (empty bins keep their
running sum untouched):
    acc_sum[i] = mmt * acc_sum[i] + (1 - mmt) * num_in_bin
    weights[in bin i] = tot / acc_sum[i]
n = number of non-empty bins; weights /= n; loss = sum(loss*w)/tot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import LOSSES
from .cross_entropy_loss import binary_cross_entropy_with_logits


def _bin_weights(g, valid, bins: int, momentum: float, acc_sum, tot=None):
    """Shared GHM density weighting.  g: gradient-norm proxy in [0, 1);
    valid: bool mask like g.  ``tot`` overrides the normalizer (GHMR uses
    label_weight.sum()/4 — per box, not per coordinate — while GHMC uses the
    valid count).  Returns (weights, tot, new_acc_sum)."""
    validf = valid.astype(jnp.float32)
    if tot is None:
        tot = jnp.maximum(jnp.sum(validf), 1.0)
    idx = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    onehot = jax.nn.one_hot(idx, bins, dtype=jnp.float32)
    counts = jnp.sum(onehot * validf[..., None],
                     axis=tuple(range(onehot.ndim - 1)))  # (bins,)
    nonempty = counts > 0
    n = jnp.sum(nonempty)
    if momentum > 0:
        assert acc_sum is not None, \
            "GHM momentum>0 needs the carried acc_sum (flax 'ghm' collection)"
        new_acc = jnp.where(nonempty,
                            momentum * acc_sum + (1 - momentum) * counts,
                            acc_sum)
        gd = jnp.where(nonempty, tot / jnp.maximum(new_acc, 1e-12), 0.0)
    else:
        new_acc = acc_sum
        gd = jnp.where(nonempty, tot / jnp.maximum(counts, 1.0), 0.0)
    weights = jnp.sum(onehot * gd, axis=-1) * validf
    weights = weights / jnp.maximum(n, 1.0)
    return weights, tot, new_acc


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

    @property
    def stateful(self) -> bool:
        return self.momentum > 0

    def __call__(self, pred, target, label_weight, avg_factor=None,
                 reduction_override=None, acc_sum=None):
        target = target.astype(jnp.float32)
        label_weight = label_weight.astype(jnp.float32)
        g = jnp.abs(jax.nn.sigmoid(pred) - target)  # gradient norm proxy
        weights, tot, new_acc = _bin_weights(g, label_weight > 0, self.bins,
                                             self.momentum, acc_sum)
        loss = binary_cross_entropy_with_logits(pred, target) * weights
        out = self.loss_weight * jnp.sum(loss) / tot
        return (out, new_acc) if self.stateful else out


@LOSSES.register_module
class GHMCAdapter(object):
    """Adapter matching the AnchorHead loss contract (int labels, per-anchor
    weight, avg_factor) on top of GHMC's one-hot interface."""

    def __init__(self, bins: int = 10, momentum: float = 0.0,
                 loss_weight: float = 1.0):
        self.ghmc = GHMC(bins=bins, momentum=momentum,
                         loss_weight=loss_weight)
        self.bins = bins

    @property
    def stateful(self) -> bool:
        return self.ghmc.stateful

    def __call__(self, pred, labels, weight=None, avg_factor=None,
                 reduction_override=None, acc_sum=None):
        C = pred.shape[-1]
        onehot = jax.nn.one_hot(labels - 1, C, dtype=pred.dtype)
        onehot = jnp.where((labels > 0)[..., None], onehot, 0.0)
        lw = jnp.ones_like(pred) if weight is None else \
            jnp.broadcast_to(weight[..., None], pred.shape)
        return self.ghmc(pred, onehot, lw, acc_sum=acc_sum)


@LOSSES.register_module
class GHMRAdapter(object):
    """AnchorHead-contract adapter for GHMR (ignores avg_factor: GHM
    normalizes by valid count, like the reference)."""

    def __init__(self, mu: float = 0.02, bins: int = 10,
                 momentum: float = 0.0, loss_weight: float = 1.0):
        self.ghmr = GHMR(mu=mu, bins=bins, momentum=momentum,
                         loss_weight=loss_weight)
        self.bins = bins

    @property
    def stateful(self) -> bool:
        return self.ghmr.stateful

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, acc_sum=None):
        lw = jnp.ones_like(pred) if weight is None else weight
        return self.ghmr(pred, target, lw, acc_sum=acc_sum)


@LOSSES.register_module
class GHMR:
    """GHM regression loss (ASL1) over (N, 4) deltas."""

    def __init__(self, mu: float = 0.02, bins: int = 10, momentum: float = 0.0,
                 loss_weight: float = 1.0):
        self.mu = mu
        self.bins = bins
        self.momentum = momentum
        self.loss_weight = loss_weight

    @property
    def stateful(self) -> bool:
        return self.momentum > 0

    def __call__(self, pred, target, label_weight, avg_factor=None,
                 reduction_override=None, acc_sum=None):
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        g = jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff))
        # ref GHMR normalizer: label_weight.sum() / 4 (per box, 4 coords);
        # tot cancels inside the bin weights, so this only shows at the
        # max(.,1) clamp — kept exact anyway
        tot = jnp.maximum(jnp.sum(label_weight.astype(jnp.float32)) / 4.0,
                          1.0)
        weights, tot, new_acc = _bin_weights(g, label_weight > 0, self.bins,
                                             self.momentum, acc_sum, tot=tot)
        out = self.loss_weight * jnp.sum(loss * weights) / tot
        return (out, new_acc) if self.stateful else out
