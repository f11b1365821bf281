"""Samplers (ref: mmdet/core/bbox/samplers/pseudo_sampler.py (PseudoSampler)).

RetinaNet uses ``sampling=False`` -> the pseudo sampler: every assigned
positive and every background anchor participates in the loss.  In the
fixed-shape world a "sample" is just a pair of boolean masks — no index
gathers.  Random/OHEM subsampling samplers are two-stage machinery; a
mask-based RandomSampler is provided for breadth.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .assigners import AssignResult


class SampleMasks(NamedTuple):
    pos_mask: jnp.ndarray  # (A,) bool
    neg_mask: jnp.ndarray  # (A,) bool


class PseudoSampler:
    def sample(self, assign_result: AssignResult, *_, **__) -> SampleMasks:
        return SampleMasks(assign_result.gt_inds > 0, assign_result.gt_inds == 0)


def _cap_by_rank(mask: jnp.ndarray, limit, priority: jnp.ndarray) -> jnp.ndarray:
    """Keep at most ``limit`` True entries of ``mask``, highest ``priority``
    first — the fixed-shape subsampling primitive shared by every sampler."""
    score = jnp.where(mask, priority, -jnp.inf)
    rank = jnp.argsort(jnp.argsort(-score))
    return mask & (rank < limit)


class RandomSampler:
    """Mask-based analog of the reference's RandomSampler (ref:
    mmdet/core/bbox/samplers/random_sampler.py): cap positives at
    ``num * pos_fraction`` and fill with negatives, selected uniformly.
    Rank-based selection keeps shapes static.
    """

    def __init__(self, num: int, pos_fraction: float, neg_pos_ub: int = -1,
                 add_gt_as_proposals: bool = False):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def _pos_priority(self, assign_result: AssignResult, key) -> jnp.ndarray:
        return jax.random.uniform(key, assign_result.gt_inds.shape)

    def _neg_priority(self, assign_result: AssignResult, key) -> jnp.ndarray:
        return jax.random.uniform(key, assign_result.gt_inds.shape)

    def sample(self, assign_result: AssignResult, rng: jax.Array) -> SampleMasks:
        pos = assign_result.gt_inds > 0
        neg = assign_result.gt_inds == 0
        k_pos, k_neg = jax.random.split(rng)
        max_pos = int(self.num * self.pos_fraction)
        pos_s = _cap_by_rank(pos, max_pos, self._pos_priority(assign_result, k_pos))
        n_neg = self.num - jnp.sum(pos_s)
        if self.neg_pos_ub >= 0:
            n_neg = jnp.minimum(n_neg, self.neg_pos_ub * jnp.maximum(
                jnp.sum(pos_s), 1))
        neg_s = _cap_by_rank(neg, n_neg, self._neg_priority(assign_result, k_neg))
        return SampleMasks(pos_s, neg_s)


class InstanceBalancedPosSampler(RandomSampler):
    """ref: instance_balanced_pos_sampler.py — spread positive sampling
    evenly across gt instances.  Fixed-shape form: priority favors each gt's
    lowest-noise anchors round-robin by per-instance rank."""

    def _pos_priority(self, assign_result: AssignResult, key) -> jnp.ndarray:
        noise = jax.random.uniform(key, assign_result.gt_inds.shape)
        gt = assign_result.gt_inds
        # within-instance rank: count same-gt entries with smaller noise
        same = (gt[:, None] == gt[None, :]) & (noise[None, :] < noise[:, None])
        within = jnp.sum(same, axis=1).astype(jnp.float32)
        # lower within-instance rank -> higher priority
        return -within + noise * 1e-3

    def _neg_priority(self, assign_result, key):
        return jax.random.uniform(key, assign_result.gt_inds.shape)


class IoUBalancedNegSampler(RandomSampler):
    """ref: iou_balanced_neg_sampler.py (Libra R-CNN) — sample negatives
    evenly over IoU bins.  Fixed-shape form: priority = within-IoU-bin noise
    rank inverted, so each bin contributes before any bin repeats."""

    def __init__(self, num: int, pos_fraction: float, floor_thr: float = -1,
                 floor_fraction: float = 0, num_bins: int = 3, **kw):
        super().__init__(num, pos_fraction, **kw)
        self.num_bins = num_bins
        self.floor_thr = floor_thr

    def _neg_priority(self, assign_result: AssignResult, key) -> jnp.ndarray:
        noise = jax.random.uniform(key, assign_result.gt_inds.shape)
        neg = assign_result.gt_inds == 0
        iou = jnp.clip(assign_result.max_overlaps, 0.0, 0.999)
        bin_idx = (iou * self.num_bins).astype(jnp.int32)
        # within-bin rank by NOISE over negatives only: bins contribute
        # round-robin (rank-0 of every bin before any rank-1), matching the
        # per-bin quota semantics without positional bias
        same_bin = (bin_idx[:, None] == bin_idx[None, :]) & neg[None, :] & \
            (noise[None, :] < noise[:, None])
        within = jnp.sum(same_bin, axis=1).astype(jnp.float32)
        return -within + noise * 1e-3


class OHEMSampler(RandomSampler):
    """ref: ohem_sampler.py — hardest examples by loss.  The loss-aware
    priority must be supplied by the caller (losses are computed in the
    head); ``sample_with_losses`` selects by descending loss."""

    def sample_with_losses(self, assign_result: AssignResult,
                           losses: jnp.ndarray, rng: jax.Array) -> SampleMasks:
        pos = assign_result.gt_inds > 0
        neg = assign_result.gt_inds == 0
        max_pos = int(self.num * self.pos_fraction)
        pos_s = _cap_by_rank(pos, max_pos, losses)
        n_neg = self.num - jnp.sum(pos_s)
        neg_s = _cap_by_rank(neg, n_neg, losses)
        return SampleMasks(pos_s, neg_s)


class CombinedSampler:
    """ref: combined_sampler.py — independent pos/neg sampler choices."""

    def __init__(self, pos_sampler, neg_sampler):
        self.pos_sampler = pos_sampler
        self.neg_sampler = neg_sampler

    def sample(self, assign_result: AssignResult, rng: jax.Array) -> SampleMasks:
        k1, k2 = jax.random.split(rng)
        pos = self.pos_sampler.sample(assign_result, k1).pos_mask
        neg = self.neg_sampler.sample(assign_result, k2).neg_mask
        return SampleMasks(pos, neg)


_SAMPLERS = {
    "PseudoSampler": PseudoSampler,
    "RandomSampler": RandomSampler,
    "InstanceBalancedPosSampler": InstanceBalancedPosSampler,
    "IoUBalancedNegSampler": IoUBalancedNegSampler,
    "OHEMSampler": OHEMSampler,
}


def build_sampler(cfg: dict):
    """Sampler factory from a ``type=`` config dict (ref:
    mmdet/core/bbox/assign_sampling.py (build_sampler))."""
    cfg = dict(cfg)
    typ = cfg.pop("type", "RandomSampler")
    if typ == "CombinedSampler":
        return CombinedSampler(build_sampler(cfg.pop("pos_sampler")),
                               build_sampler(cfg.pop("neg_sampler")))
    return _SAMPLERS[typ](**cfg)
