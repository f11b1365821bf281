"""Hand-derived golden values for GuidedAnchorHead targets/losses
(VERDICT r2 item 8: GA rode on smoke tests only).

Ref: mmdet/core/anchor/guided_anchor_target.py (ga_loc_target,
ga_shape_target) + mmdet/models/anchor_heads/guided_anchor_head.py
(loss_shape_single, loss_loc_single)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ioudet.models.heads.guided_anchor_head import GuidedAnchorHead


def _head(**kw):
    kw.setdefault("num_classes", 2)
    kw.setdefault("in_channels", 8)
    kw.setdefault("feat_channels", 8)
    kw.setdefault("anchor_strides", (8, 16))
    kw.setdefault("anchor_ratios", (1.0,))
    kw.setdefault("octave_base_scale", 4)
    kw.setdefault("scales_per_octave", 1)
    kw.setdefault("center_ratio", 0.5)
    kw.setdefault("ignore_ratio", 1.0)
    return GuidedAnchorHead(**kw)


class TestLocTargetsGolden:
    """GT [0,0,31,31]: scale = sqrt(32*32) = 32 = octave_base_scale*stride0
    -> level 0.  Grid lvl0 (8,8)@8 (centers 4,12,..,60), lvl1 (4,4)@16
    (centers 8,24,40,56).  center (15.5, 15.5), w=h=32 (+1 convention).

    center_ratio 0.5 -> half-extent 8: |c-15.5|<=8 -> centers {12,20} =
    rows/cols {1,2} -> 4 positive cells on lvl0.
    ignore_ratio 1.0 -> half-extent 16: |c-15.5|<=16 -> lvl0 rows/cols
    {0..3} (16 cells; the 12 non-positive get weight 0); lvl1 (adjacent
    level) centers {8,24} = rows/cols {0,1} -> 4 cells weight 0."""

    def setup_method(self):
        self.head = _head()
        self.gt = jnp.asarray([[[0.0, 0.0, 31.0, 31.0]]])  # (B=1, G=1, 4)
        self.valid = jnp.ones((1, 1), bool)
        self.sizes = [(8, 8), (4, 4)]

    def test_exact_cells(self):
        targets, weights = self.head._loc_targets(self.gt, self.valid,
                                                  self.sizes)
        t0 = np.asarray(targets[0]).reshape(8, 8)
        w0 = np.asarray(weights[0]).reshape(8, 8)
        t1 = np.asarray(targets[1]).reshape(4, 4)
        w1 = np.asarray(weights[1]).reshape(4, 4)

        exp_t0 = np.zeros((8, 8))
        exp_t0[1:3, 1:3] = 1.0
        np.testing.assert_array_equal(t0, exp_t0)

        exp_w0 = np.ones((8, 8))
        exp_w0[0:4, 0:4] = 0.0
        exp_w0[1:3, 1:3] = 1.0  # positives keep weight 1
        np.testing.assert_array_equal(w0, exp_w0)

        np.testing.assert_array_equal(t1, np.zeros((4, 4)))
        exp_w1 = np.ones((4, 4))
        exp_w1[0:2, 0:2] = 0.0
        np.testing.assert_array_equal(w1, exp_w1)

    def test_level_routing(self):
        """A 64x64 gt (scale 64 = 2*base) must land on level 1, with the
        ignore ring reaching level 0 (adjacent)."""
        gt = jnp.asarray([[[0.0, 0.0, 63.0, 63.0]]])
        targets, weights = self.head._loc_targets(gt, self.valid, self.sizes)
        t0 = np.asarray(targets[0])
        t1 = np.asarray(targets[1]).reshape(4, 4)
        assert t0.sum() == 0  # no positives on lvl0
        # lvl1 centers 8,24,40,56; center 31.5, half = 64*0.5/2 = 16
        # -> |c-31.5|<=16 -> {24,40} = rows/cols {1,2}
        exp = np.zeros((4, 4))
        exp[1:3, 1:3] = 1.0
        np.testing.assert_array_equal(t1, exp)
        # lvl0 (adjacent): ignore half 32 -> centers |c-31.5|<=32 ->
        # 4..60 all -> whole lvl0 weight 0
        np.testing.assert_array_equal(np.asarray(weights[0]), 0.0)

    def test_loc_loss_value(self):
        """End value: constant logits L=-2 everywhere; hand-computed focal
        (paper formula, alpha=.25, gamma=2) over the derived target/weight
        maps, normalized by num_pos=4."""
        targets, weights = self.head._loc_targets(self.gt, self.valid,
                                                  self.sizes)
        t = np.concatenate([np.asarray(x).ravel() for x in targets])
        w = np.concatenate([np.asarray(x).ravel() for x in weights])
        L = -2.0
        p = 1.0 / (1.0 + np.exp(-L))
        f_pos = 0.25 * (1 - p) ** 2 * -np.log(p)
        f_neg = 0.75 * p ** 2 * -np.log(1 - p)
        expected = (t * f_pos + (1 - t) * f_neg) * w
        expected = expected.sum() / max(t.sum(), 1.0)

        from ioudet.models.losses.focal_loss import \
            sigmoid_focal_loss_with_logits
        loc_flat = jnp.full((1, t.size), L, jnp.float32)
        t_flat = jnp.asarray(t)[None]
        w_flat = jnp.asarray(w)[None]
        got = float(jnp.sum(sigmoid_focal_loss_with_logits(
            loc_flat, t_flat) * w_flat) / jnp.maximum(jnp.sum(t_flat), 1.0))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestShapeTargetsGolden:
    def test_loss_shape_zero_when_gt_equals_square(self):
        """With shape_preds = 0 the predicted anchors ARE the squares; a GT
        exactly equal to one square must (a) make that cell positive via the
        approx assignment and (b) contribute zero bounded-IoU loss."""
        head = _head()
        B = 1
        sizes = [(8, 8), (4, 4)]
        # the EXACT square of lvl0 cell (row 2, col 2): AnchorGenerator
        # base_size=8, scale 4 -> [4, 4, 35, 35] (center 19.5, size 32,
        # +1 convention) — verified against grid_anchors in setup.
        # pos_iou_thr=0.65 keeps the 4-neighbors (IoU = 0.6 for an aligned
        # square) negative so the only positive is the aligned cell, whose
        # bounded-IoU loss against the identical gt is 0.
        sq = np.asarray(head.square_generators()[0].grid_anchors(
            (8, 8), 8)).reshape(8, 8, 4)
        np.testing.assert_allclose(sq[2, 2], [4.0, 4.0, 35.0, 35.0])
        gt = jnp.asarray([[[4.0, 4.0, 35.0, 35.0]]])
        gv = jnp.ones((1, 1), bool)
        cls_scores = [jnp.full((B, h, w, 1), -4.0) for h, w in sizes]
        bbox_preds = [jnp.zeros((B, h, w, 4)) for h, w in sizes]
        shape_preds = [jnp.zeros((B, h, w, 2)) for h, w in sizes]
        loc_preds = [jnp.full((B, h, w, 1), -4.0) for h, w in sizes]
        img_shapes = jnp.asarray([[64, 64]], jnp.int32)
        losses = head.loss(
            cls_scores, bbox_preds, shape_preds, loc_preds, gt,
            jnp.ones((1, 1), jnp.int32), gv, img_shapes, img_shapes,
            dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                               min_pos_iou=0.0),
                 ga_assigner=dict(pos_iou_thr=0.65, neg_iou_thr=0.4,
                                  min_pos_iou=0.0),
                 allowed_border=-1))
        assert float(losses["loss_shape"]) == pytest.approx(0.0, abs=1e-5)
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, v)

    def test_shape_assignment_numpy_oracle(self):
        """The per-cell approx assignment (max IoU over the cell's approx
        anchors, thresholds 0.5/0.4, forced best per gt) against a plain
        numpy re-derivation on a random case."""
        head = _head(scales_per_octave=3, anchor_ratios=(0.5, 1.0, 2.0))
        sizes = [(4, 4), (2, 2)]
        rng = np.random.default_rng(0)
        xy = rng.uniform(0, 20, (1, 3, 2)).astype(np.float32)
        wh = rng.uniform(10, 40, (1, 3, 2)).astype(np.float32)
        gt = np.concatenate([xy, xy + wh], -1)

        approx_gens = head.approx_generators()
        approx = np.concatenate([
            np.asarray(g.grid_anchors(s, st)) for g, s, st in
            zip(approx_gens, sizes, head.anchor_strides)])
        A = head.num_approx
        C = approx.shape[0] // A

        def iou(a, b):
            ax1, ay1, ax2, ay2 = a
            iw = np.minimum(ax2, b[:, 2]) - np.maximum(ax1, b[:, 0]) + 1
            ih = np.minimum(ay2, b[:, 3]) - np.maximum(ay1, b[:, 1]) + 1
            inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
            aa = (ax2 - ax1 + 1) * (ay2 - ay1 + 1)
            ab = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
            return inter / (aa + ab - inter)

        ious = np.stack([iou(g, approx) for g in gt[0]])  # (G, C*A)
        cell_ious = ious.reshape(3, C, A).max(-1)         # (G, C)
        best_per_cell = cell_ious.max(0)
        arg_per_cell = cell_ious.argmax(0)
        pos = best_per_cell >= 0.5
        # forced: each gt's best cell(s) positive (min_pos_iou=0).  mmdet's
        # gt_max_assign_all forces EVERY cell tying the gt's max IoU, in gt
        # order (later gts overwrite earlier assignments)
        expected_pos = pos.copy()
        expected_match = np.where(pos, arg_per_cell, -1)
        for g in range(3):
            tie = cell_ious[g] == cell_ious[g].max()
            expected_pos[tie] = True
            expected_match[tie] = g

        # drive the head's assignment through loss() and read pos count via
        # num_pos-normalized shape loss: instead, replicate assign_one here
        import jax
        from ioudet.core.bbox.assigners import assign_max_iou
        from ioudet.core.bbox.geometry import bbox_overlaps as bo

        ious_j = bo(jnp.asarray(gt[0]), jnp.asarray(approx))
        ious_j = ious_j.reshape(3, C, A).max(-1)
        res = assign_max_iou(ious_j, jnp.ones((3,), bool),
                             jnp.ones((C,), bool), None,
                             pos_iou_thr=0.5, neg_iou_thr=0.4,
                             min_pos_iou=0.0)
        got_pos = np.asarray(res.gt_inds > 0)
        got_match = np.asarray(res.gt_inds) - 1
        np.testing.assert_array_equal(got_pos, expected_pos)
        # matched gt agrees wherever positive (ties impossible w/ random gts)
        np.testing.assert_array_equal(got_match[got_pos],
                                      expected_match[expected_pos])
