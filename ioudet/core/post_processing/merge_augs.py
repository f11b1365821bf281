"""Test-time-augmentation merging (ref: mmdet/core/post_processing/merge_augs.py
(merge_aug_bboxes, merge_aug_scores)).

Each augmented view's decoded boxes are mapped back to original-image space
through the inverse of its (scale, flip) transform, concatenated, and a single
NMS runs over the union.  The reference's SingleStageDetector.aug_test raised
NotImplementedError at this vintage; we implement the documented merge
semantics so multi-scale TTA works for the single-stage family too.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from ..bbox.transforms import bbox_mapping_back


def merge_aug_bboxes(aug_bboxes: Sequence[jnp.ndarray],
                     aug_scores: Sequence[jnp.ndarray],
                     img_metas: Sequence[dict]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map per-view boxes back to original image space and concatenate.

    aug_bboxes: list of (N, 4); aug_scores: list of (N, C);
    img_metas: per view dict with 'img_shape', 'scale_factor', 'flip'.
    """
    recovered = []
    for bboxes, meta in zip(aug_bboxes, img_metas):
        recovered.append(
            bbox_mapping_back(bboxes, meta["img_shape"], meta["scale_factor"],
                              meta["flip"]))
    bboxes = jnp.concatenate(recovered, axis=0)
    scores = jnp.concatenate(list(aug_scores), axis=0)
    return bboxes, scores


def merge_aug_scores(aug_scores: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.mean(jnp.stack(list(aug_scores)), axis=0)
