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


class TestGreedyKeepPallas:
    """Single-kernel greedy NMS (greedy_keep_pallas): bit-identical keep
    masks vs the XLA fixed-point, incl. invalid boxes and padding."""

    def test_matches_xla_with_invalid(self):
        from ioudet.ops.nms_pallas import greedy_keep_pallas
        rng = np.random.default_rng(7)
        for n in (100, 256):  # 100 exercises the pad-to-128 path
            b = jnp.asarray(sorted_boxes(n, 1))
            valid = jnp.asarray(rng.uniform(size=n) < 0.85)
            keep_p = np.asarray(greedy_keep_pallas(b, valid, 0.5))
            keep_x = np.asarray(greedy_suppress(bbox_overlaps(b, b),
                                                valid, 0.5))
            np.testing.assert_array_equal(keep_p, keep_x)

    def test_multiclass_nms_pallas_greedy_mode(self):
        from ioudet.core.post_processing import multiclass_nms
        rng = np.random.default_rng(3)
        n, C = 120, 6
        cx = rng.uniform(20, 200, (n, 2)).astype(np.float32)
        wh = rng.uniform(10, 60, (n, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([cx - wh / 2, cx + wh / 2], -1))
        scores = jnp.asarray(rng.uniform(0, 1, (n, C)).astype(np.float32) *
                             (rng.uniform(0, 1, (n, C)) < 0.1))
        kw = dict(score_thr=0.05, iou_thr=0.5, max_per_img=20,
                  pre_nms_total=128)
        d0, l0 = multiclass_nms(boxes, scores, **kw)
        d1, l1 = multiclass_nms(boxes, scores, nms_type="pallas_greedy", **kw)
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
