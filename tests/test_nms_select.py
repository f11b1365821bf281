"""Exactness of the sort-free NMS candidate selection (round 5).

The production eval program replaced its two sort-based selections —
per-anchor ``class_topk`` (``lax.top_k`` over the 80-class axis) and the
global ``pre_nms_total`` stage (``lax.top_k`` over the ~20k flat candidate
vector) — with iterative argmax / binary-search-threshold forms
(``bbox_nms._iter_topk`` / ``_threshold_topk``).  These must be
BIT-IDENTICAL to ``lax.top_k`` including its tie rule (equal values ->
ascending index), because every AP guard in the suite pins the exact
decode.  Ref semantics: mmdet/core/post_processing/bbox_nms.py
(multiclass_nms) score ordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ioudet.core.post_processing.bbox_nms import (_iter_topk,
                                                  _threshold_topk,
                                                  multiclass_nms)


class TestIterTopk:
    def test_matches_lax_topk_random(self):
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.uniform(0, 1, (257, 80)).astype(np.float32))
        for k in (1, 2, 4, 7):
            v_ref, i_ref = jax.lax.top_k(s, k)
            v, i = _iter_topk(s, k)
            np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_tie_rule_ascending_index(self):
        # heavy duplicates: quantized scores force many exact ties
        rng = np.random.default_rng(1)
        s = jnp.asarray((rng.integers(0, 5, (64, 80)) / 4.0
                         ).astype(np.float32))
        v_ref, i_ref = jax.lax.top_k(s, 4)
        v, i = _iter_topk(s, 4)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_all_equal_row(self):
        s = jnp.full((3, 16), 0.25, jnp.float32)
        v, i = _iter_topk(s, 3)
        np.testing.assert_array_equal(np.asarray(i),
                                      np.tile([0, 1, 2], (3, 1)))
        np.testing.assert_array_equal(np.asarray(v), np.full((3, 3), 0.25))


class TestThresholdTopk:
    @pytest.mark.parametrize("m,k", [(100, 10), (2000, 200), (20000, 2000),
                                     (50, 50)])
    def test_matches_lax_topk_random(self, m, k):
        rng = np.random.default_rng(m + k)
        x = jnp.asarray(rng.uniform(0, 1, (m,)).astype(np.float32))
        v_ref, i_ref = jax.lax.top_k(x, k)
        v, i = _threshold_topk(x, k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_ties_at_threshold(self):
        # exactly the adversarial case: the k-th value occurs many times
        rng = np.random.default_rng(3)
        x = np.round(rng.uniform(0, 1, 5000).astype(np.float32) * 8) / 8
        x = jnp.asarray(x)
        for k in (1, 7, 500, 4999):
            v_ref, i_ref = jax.lax.top_k(x, k)
            v, i = _threshold_topk(x, k)
            np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_mostly_zeros(self):
        # production shape: most candidates are gated to exactly 0.0
        rng = np.random.default_rng(4)
        x = np.zeros(20000, np.float32)
        pos = rng.choice(20000, 300, replace=False)
        x[pos] = rng.uniform(0.05, 1.0, 300).astype(np.float32)
        x = jnp.asarray(x)
        v_ref, i_ref = jax.lax.top_k(x, 2000)
        v, i = _threshold_topk(x, 2000)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_all_zero(self):
        x = jnp.zeros(512, jnp.float32)
        v, i = _threshold_topk(x, 64)
        np.testing.assert_array_equal(np.asarray(i), np.arange(64))
        np.testing.assert_array_equal(np.asarray(v), np.zeros(64))

    def test_denormals_and_extremes(self):
        x = jnp.asarray(np.array(
            [0.0, 1e-45, 1e-38, 1e-30, 3.4e38, 1.0, 1.0, 1e-45, 0.5],
            np.float32))
        for k in (1, 3, 5, 9):
            v_ref, i_ref = jax.lax.top_k(x, k)
            v, i = _threshold_topk(x, k)
            np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_under_vmap(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(0, 1, (4, 3000)).astype(np.float32))
        v_ref, i_ref = jax.vmap(lambda a: jax.lax.top_k(a, 300))(x)
        v, i = jax.vmap(lambda a: _threshold_topk(a, 300))(x)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def _random_case(rng, n=600, c=12, per_class_boxes=False):
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    # quantize a slice to force cross-anchor ties
    scores[: n // 3] = np.round(scores[: n // 3] * 16) / 16
    xy = rng.uniform(0, 80, (n, 2)).astype(np.float32)
    wh = rng.uniform(4, 40, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    if per_class_boxes:
        boxes = np.tile(boxes[:, None, :], (1, c, 1)) + rng.uniform(
            -2, 2, (n, c, 4)).astype(np.float32)
        boxes = boxes.reshape(n, c * 4)
    return jnp.asarray(boxes), jnp.asarray(scores)


class TestMulticlassNmsSelectEquivalence:
    """End-to-end: multiclass_nms(threshold) == multiclass_nms(sort)."""

    @pytest.mark.parametrize("mode", ["threshold", "iter_cls", "thresh_flat"])
    @pytest.mark.parametrize("class_topk", [None, 3])
    @pytest.mark.parametrize("per_class_boxes", [False, True])
    def test_bit_identical(self, mode, class_topk, per_class_boxes):
        rng = np.random.default_rng(42)
        boxes, scores = _random_case(rng, per_class_boxes=per_class_boxes)
        kw = dict(score_thr=0.05, iou_thr=0.5, max_per_img=50,
                  pre_nms_total=256, class_topk=class_topk)
        d_ref, l_ref = multiclass_nms(boxes, scores, exact_select="sort",
                                      **kw)
        d, l = multiclass_nms(boxes, scores, exact_select=mode, **kw)
        np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
        np.testing.assert_array_equal(np.asarray(l), np.asarray(l_ref))

    def test_with_score_factors_and_valid(self):
        rng = np.random.default_rng(7)
        boxes, scores = _random_case(rng)
        factors = jnp.asarray(rng.uniform(0.2, 1.0, (600,)).astype(
            np.float32))
        valid = jnp.asarray(rng.uniform(0, 1, 600) > 0.2)
        kw = dict(score_thr=0.05, iou_thr=0.5, max_per_img=30,
                  pre_nms_total=128, class_topk=2,
                  score_factors=factors, valid=valid)
        d_ref, l_ref = multiclass_nms(boxes, scores, exact_select="sort",
                                      **kw)
        d, l = multiclass_nms(boxes, scores, exact_select="threshold", **kw)
        np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
        np.testing.assert_array_equal(np.asarray(l), np.asarray(l_ref))
