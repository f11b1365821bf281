"""Pallas suppression-matrix kernel vs the XLA path (interpret mode on the
CPU mesh; compiled on real TPU)."""

import numpy as np
import jax.numpy as jnp

from ioudet.core.bbox.geometry import bbox_overlaps
from ioudet.ops.nms import greedy_suppress
from ioudet.ops.nms_pallas import greedy_nms_pallas, suppression_matrix


def sorted_boxes(n, seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes[np.argsort(-scores)]


class TestPallasSuppression:
    def test_matrix_matches_reference(self):
        b = jnp.asarray(sorted_boxes(256, 0))
        supp = np.asarray(suppression_matrix(b, 0.5))
        iou = np.asarray(bbox_overlaps(b, b))
        rows, cols = np.indices(iou.shape)
        ref = ((iou > 0.5) & (cols > rows)).astype(np.float32)
        np.testing.assert_array_equal(supp, ref)

    def test_greedy_matches_xla(self):
        for seed in range(3):
            b = jnp.asarray(sorted_boxes(128, seed))
            valid = jnp.ones(128, bool)
            keep_p = np.asarray(greedy_nms_pallas(b, valid, 0.5))
            iou = bbox_overlaps(b, b)
            keep_x = np.asarray(greedy_suppress(iou, valid, 0.5))
            np.testing.assert_array_equal(keep_p, keep_x)
