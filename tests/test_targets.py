"""anchor_target fixed-shape semantics: positives get encoded gt deltas,
weights mark pos/neg, invalid anchors excluded, batching via vmap."""

import numpy as np
import jax.numpy as jnp

from ioudet.core import anchor_target, bbox2delta, MaxIoUAssigner
from ioudet.core.anchor import images_to_levels


def make_inputs():
    anchors = np.array([
        [0, 0, 9, 9],
        [50, 50, 59, 59],
        [100, 100, 109, 109],
        [0, 0, 9, 9],     # duplicate anchor, will be marked invalid
    ], np.float32)
    gt = np.zeros((3, 4), np.float32)
    gt[0] = [0, 0, 9, 9]
    gt[1] = [50, 50, 59, 59]
    gt_valid = np.array([True, True, False])
    gt_labels = np.array([5, 7, 0], np.int32)
    valid = np.array([True, True, True, False])
    return anchors, gt, gt_valid, gt_labels, valid


class TestAnchorTarget:
    def test_single_image_semantics(self):
        anchors, gt, gt_valid, gt_labels, valid = make_inputs()
        assigner = MaxIoUAssigner(0.5, 0.4, 0)
        t = anchor_target(
            jnp.asarray(anchors), jnp.asarray(valid)[None],
            jnp.asarray(gt)[None], jnp.asarray(gt_valid)[None],
            jnp.asarray(gt_labels)[None],
            jnp.asarray([[120, 120]], jnp.int32), assigner)
        labels = np.asarray(t.labels)[0]
        lw = np.asarray(t.label_weights)[0]
        bw = np.asarray(t.bbox_weights)[0]
        assert labels[0] == 5 and labels[1] == 7
        assert labels[2] == 0 and lw[2] == 1.0       # negative
        assert lw[3] == 0.0                          # invalid: excluded
        assert bw[0].sum() == 4 and bw[2].sum() == 0
        assert int(t.num_total_pos) == 2
        assert int(t.num_total_neg) == 1
        # encoded target: perfect-overlap anchors -> zero deltas
        bt = np.asarray(t.bbox_targets)[0]
        np.testing.assert_allclose(bt[0], 0, atol=1e-6)
        # pos_gt_boxes carries the raw assigned gt
        np.testing.assert_allclose(np.asarray(t.pos_gt_boxes)[0][1], gt[1])

    def test_target_encoding_matches_bbox2delta(self):
        anchors = np.array([[0, 0, 19, 19]], np.float32)
        gt = np.array([[2, 3, 18, 22]], np.float32).reshape(1, 1, 4)
        assigner = MaxIoUAssigner(0.3, 0.2, 0)
        t = anchor_target(
            jnp.asarray(anchors), jnp.ones((1, 1), bool),
            jnp.asarray(gt), jnp.ones((1, 1), bool),
            jnp.asarray([[1]], jnp.int32),
            jnp.asarray([[40, 40]], jnp.int32), assigner,
            target_means=(0., 0., 0., 0.), target_stds=(0.1, 0.1, 0.2, 0.2))
        expected = np.asarray(bbox2delta(anchors, gt[0],
                                         (0., 0., 0., 0.),
                                         (0.1, 0.1, 0.2, 0.2)))
        np.testing.assert_allclose(np.asarray(t.bbox_targets)[0, 0],
                                   expected[0], rtol=1e-5)

    def test_batched(self):
        anchors, gt, gt_valid, gt_labels, valid = make_inputs()
        assigner = MaxIoUAssigner(0.5, 0.4, 0)
        B = 3
        t = anchor_target(
            jnp.asarray(anchors), jnp.tile(jnp.asarray(valid)[None], (B, 1)),
            jnp.tile(jnp.asarray(gt)[None], (B, 1, 1)),
            jnp.tile(jnp.asarray(gt_valid)[None], (B, 1)),
            jnp.tile(jnp.asarray(gt_labels)[None], (B, 1)),
            jnp.tile(jnp.asarray([[120, 120]], jnp.int32), (B, 1)), assigner)
        assert int(t.num_total_pos) == 2 * B
        assert t.labels.shape == (B, 4)

    def test_images_to_levels(self):
        x = jnp.arange(24).reshape(2, 12)
        levels = images_to_levels(x, [8, 4])
        assert levels[0].shape == (2, 8) and levels[1].shape == (2, 4)
        np.testing.assert_array_equal(np.asarray(levels[1])[0],
                                      np.arange(8, 12))
