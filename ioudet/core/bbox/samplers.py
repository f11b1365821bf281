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


class RandomSampler:
    """Mask-based analog of the reference's RandomSampler (ref:
    mmdet/core/bbox/samplers/random_sampler.py): cap positives at
    ``num * pos_fraction`` and fill with negatives, selected uniformly.
    Uses top-k over random keys so shapes stay static.
    """

    def __init__(self, num: int, pos_fraction: float, neg_pos_ub: int = -1,
                 add_gt_as_proposals: bool = False):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def sample(self, assign_result: AssignResult, rng: jax.Array) -> SampleMasks:
        pos = assign_result.gt_inds > 0
        neg = assign_result.gt_inds == 0
        max_pos = int(self.num * self.pos_fraction)
        k_pos, k_neg = jax.random.split(rng)

        def cap(mask, limit, key):
            noise = jax.random.uniform(key, mask.shape)
            score = jnp.where(mask, noise, -1.0)
            n = jnp.minimum(jnp.sum(mask), limit)
            thresh = jnp.sort(score)[::-1][jnp.clip(n - 1, 0, mask.shape[0] - 1)]
            return mask & (score >= thresh) & (n > 0)

        pos_s = cap(pos, max_pos, k_pos)
        n_neg_target = self.num - jnp.sum(pos_s)
        neg_s = cap(neg, n_neg_target, k_neg)
        return SampleMasks(pos_s, neg_s)
