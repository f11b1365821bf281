"""MaxIoUAssigner edge cases, modeled on the reference's test style
(hand-built tiny tensors, exact gt_inds patterns) plus fixed-shape-specific
cases: padded gts, invalid anchors."""

import numpy as np

from ioudet.core import MaxIoUAssigner
from ioudet.core.bbox.assigners import assign_max_iou


def make_assigner(**kw):
    defaults = dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
                    gt_max_assign_all=True, ignore_iof_thr=-1)
    defaults.update(kw)
    return MaxIoUAssigner(**defaults)


class TestAssign:
    def test_basic(self):
        anchors = np.array([[0, 0, 10, 10], [10, 10, 20, 20],
                            [5, 5, 15, 15], [30, 32, 38, 42]], np.float32)
        gts = np.array([[0, 0, 10, 9], [0, 10, 10, 19]], np.float32)
        labels = np.array([2, 3], np.int32)
        res = make_assigner().assign(
            anchors, gts, np.array([True, True]),
            np.ones(4, bool), labels)
        gt_inds = np.asarray(res.gt_inds)
        # anchor0 heavily overlaps gt0 -> pos; anchor3 overlaps nothing -> neg
        assert gt_inds[0] == 1
        assert gt_inds[3] == 0
        assert np.asarray(res.labels)[0] == 2

    def test_all_negative_when_no_gt(self):
        anchors = np.array([[0, 0, 10, 10], [10, 10, 20, 20]], np.float32)
        gts = np.zeros((3, 4), np.float32)
        res = make_assigner().assign(anchors, gts, np.zeros(3, bool),
                                     np.ones(2, bool),
                                     np.zeros(3, np.int32))
        # no valid gts: every valid anchor has masked max -1 -> stays ignore(-1)?
        # reference filters empty-gt images out before assignment; here the
        # contract is: no positives, and anchors must not become positive.
        assert (np.asarray(res.gt_inds) <= 0).all()

    def test_force_assign_best_anchor(self):
        # gt whose best anchor IoU is below pos_thr still gets that anchor
        anchors = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
        gts = np.array([[0, 0, 10, 20]], np.float32)  # IoU with anchor0 ~ 0.5-
        labels = np.array([5], np.int32)
        res = make_assigner(pos_iou_thr=0.9).assign(
            anchors, gts, np.array([True]), np.ones(2, bool), labels)
        assert np.asarray(res.gt_inds)[0] == 1  # forced positive
        assert np.asarray(res.gt_inds)[1] == 0

    def test_later_gt_wins_on_shared_best_anchor(self):
        anchors = np.array([[0, 0, 10, 10]], np.float32)
        gts = np.array([[0, 0, 10, 12], [0, 0, 10, 13]], np.float32)
        res = make_assigner(pos_iou_thr=0.99).assign(
            anchors, gts, np.array([True, True]), np.ones(1, bool),
            np.array([1, 2], np.int32))
        # both gts' best anchor is anchor0; sequential loop -> gt2 wins
        assert np.asarray(res.gt_inds)[0] == 2

    def test_invalid_anchor_excluded(self):
        anchors = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
        gts = np.array([[0, 0, 10, 10]], np.float32)
        res = make_assigner().assign(
            anchors, gts, np.array([True]),
            np.array([False, True]), np.array([1], np.int32))
        gt_inds = np.asarray(res.gt_inds)
        assert gt_inds[0] == -1  # invalid -> neither pos nor neg
        assert gt_inds[1] == 1

    def test_thresholds(self):
        # anchor1: IoU ~ 0.45 -> between neg(0.4) and pos(0.5) -> ignore(-1)
        gts = np.array([[0, 0, 9, 9]], np.float32)  # area 100
        anchors = np.array([
            [0, 0, 9, 9],      # IoU 1.0 -> pos
            [0, 3, 9, 12],     # IoU 70/130 ~ 0.538 -> pos
            [0, 4, 9, 14],     # IoU 60/150 ~ 0.43  (hand: inter 6*10=60, union 100+110-60=150) -> ignore
            [0, 30, 9, 39],    # IoU 0 -> neg
        ], np.float32)
        res = make_assigner(min_pos_iou=0.45).assign(
            anchors, gts, np.array([True]), np.ones(4, bool),
            np.array([7], np.int32))
        gt_inds = np.asarray(res.gt_inds)
        assert gt_inds[0] == 1
        assert gt_inds[1] == 1
        assert gt_inds[2] == -1
        assert gt_inds[3] == 0

    def test_ignore_regions(self):
        # anchor2 sits on the gt so the gt's force-assign lands there;
        # anchor0 is covered by an ignore region; anchor1 is plain background.
        anchors = np.array([[0, 0, 10, 10], [20, 20, 30, 30],
                            [100, 100, 110, 110]], np.float32)
        gts = np.array([[100, 100, 110, 110]], np.float32)
        ignore = np.array([[0, 0, 10, 10]], np.float32)
        res = make_assigner(ignore_iof_thr=0.5).assign(
            anchors, gts, np.array([True]), np.ones(3, bool),
            np.array([1], np.int32),
            gt_bboxes_ignore=ignore, gt_ignore_valid=np.array([True]))
        gt_inds = np.asarray(res.gt_inds)
        assert gt_inds[0] == -1  # covered by ignore region
        assert gt_inds[1] == 0
        assert gt_inds[2] == 1

    def test_min_pos_iou_zero_forces_best_anchor_even_at_low_iou(self):
        """The v1 quirk we deliberately preserve: with min_pos_iou=0 every
        (valid) gt force-assigns its best-overlap anchor, however low."""
        anchors = np.array([[0, 0, 10, 10], [40, 40, 60, 60]], np.float32)
        gts = np.array([[9, 9, 11, 11]], np.float32)  # IoU ~0.03 with anchor0
        res = make_assigner().assign(anchors, gts, np.array([True]),
                                     np.ones(2, bool), np.array([3], np.int32))
        assert np.asarray(res.gt_inds)[0] == 1
        assert np.asarray(res.gt_inds)[1] == 0


class TestAssignFromOverlaps:
    def test_matrix_direct(self):
        overlaps = np.array([[0.6, 0.3, 0.45], [0.1, 0.55, 0.0]], np.float32)
        res = assign_max_iou(overlaps, np.array([True, True]),
                             np.ones(3, bool), np.array([4, 9], np.int32))
        np.testing.assert_array_equal(np.asarray(res.gt_inds), [1, 2, -1])
        np.testing.assert_array_equal(np.asarray(res.labels), [4, 9, 0])


class TestApproxMaxIoUAssigner:
    """Standalone approx assigner (ref: approx_max_iou_assigner.py): the
    square is judged by the BEST of its approx anchors."""

    def test_best_approx_wins(self):
        import jax.numpy as jnp
        from ioudet.core.bbox import ApproxMaxIoUAssigner

        gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        # square itself far (IoU 0), but one of its approxs matches the gt
        squares = jnp.asarray([[50.0, 50.0, 60.0, 60.0]])
        approxs = jnp.asarray([[[50.0, 50.0, 60.0, 60.0],
                                [0.0, 0.0, 10.0, 10.0]]])
        a = ApproxMaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4)
        res = a.assign_approx(approxs, squares, gt, jnp.asarray([True]),
                              jnp.asarray([True]))
        assert int(res.gt_inds[0]) == 1      # positive via the approx
        assert float(res.max_overlaps[0]) == 1.0

    def test_all_approx_low_is_negative(self):
        import jax.numpy as jnp
        from ioudet.core.bbox import ApproxMaxIoUAssigner

        gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        squares = jnp.asarray([[100.0, 100.0, 110.0, 110.0]])
        approxs = squares[:, None, :].repeat(2, 1)
        a = ApproxMaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                 min_pos_iou=0.5)
        res = a.assign_approx(approxs, squares, gt, jnp.asarray([True]),
                              jnp.asarray([True]))
        assert int(res.gt_inds[0]) <= 0


class TestSamplerTypesInRoISampling:
    """sample_rois_batch honors train_cfg.rcnn.sampler.type (ref:
    assign_and_sample): Libra's IoUBalancedNegSampler must draw negatives
    evenly across IoU bins instead of uniformly."""

    def _setup(self):
        import numpy as np
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        B, P, G = 1, 300, 1
        gt = jnp.asarray([[[100.0, 100.0, 200.0, 200.0]]])
        # negatives: 90% zero-IoU far boxes, 10% medium-IoU (0.1-0.4) boxes
        far = rng.uniform(300, 700, (270, 2)).astype(np.float32)
        far = np.concatenate([far, far + 50], -1)
        near = []
        for k in range(30):
            # IoU = (100-dx)/(100+dx) in (0.35, 0.49): lands in bin 1 of 3,
            # clearly separated from the zero-IoU far pool (bin 0)
            dx = 34 + k // 2
            near.append([100.0 + dx, 100.0 + (k % 2), 200.0 + dx, 200.0])
        props = jnp.asarray(np.concatenate([far, np.asarray(near, np.float32)])
                            )[None]
        return props, gt

    def _sample(self, sampler_cfg, seed=0):
        import jax
        import jax.numpy as jnp
        from ioudet.core.bbox import MaxIoUAssigner
        from ioudet.models.detectors.two_stage import sample_rois_batch
        props, gt = self._setup()
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                  min_pos_iou=0.5)
        out = sample_rois_batch(
            jax.random.PRNGKey(seed), props, jnp.ones(props.shape[:2], bool),
            gt, jnp.ones((1, 1), bool), jnp.ones((1, 1), jnp.int32),
            assigner, 64, 0.25, sampler_cfg=sampler_cfg)
        sel_boxes, sel_pos, sel_valid = out[0], out[1], out[2]
        # count selected negatives that are the "near" (medium-IoU) kind
        import numpy as np
        b = np.asarray(sel_boxes[0])
        neg = np.asarray(sel_valid[0]) & ~np.asarray(sel_pos[0])
        is_near = (b[:, 0] > 130) & (b[:, 0] < 150) & (b[:, 1] < 102)
        return int((neg & is_near).sum()), int(neg.sum())

    def test_iou_balanced_oversamples_hard_negatives(self):
        counts_rand, counts_bal = [], []
        for seed in range(4):
            n_rand, t_rand = self._sample(dict(type="RandomSampler"), seed)
            n_bal, t_bal = self._sample(
                dict(type="IoUBalancedNegSampler", num_bins=3), seed)
            counts_rand.append(n_rand / max(t_rand, 1))
            counts_bal.append(n_bal / max(t_bal, 1))
        import numpy as np
        # near boxes are 10% of the pool: random draws ~10%; balanced bins
        # must overweight them substantially
        assert np.mean(counts_bal) > np.mean(counts_rand) * 1.5, \
            (counts_rand, counts_bal)


class TestOHEMSampling:
    def test_hardness_drives_selection(self):
        """sample_rois_batch with an OHEM config + hardness_fn must select
        the highest-loss negatives, not random ones."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from ioudet.core.bbox import MaxIoUAssigner
        from ioudet.models.detectors.two_stage import sample_rois_batch

        rng = np.random.default_rng(0)
        P, G = 200, 1
        props = jnp.asarray(
            rng.uniform(300, 700, (1, P, 2)).astype(np.float32))
        props = jnp.concatenate([props, props + 40], -1)  # all negatives
        gt = jnp.asarray([[[0.0, 0.0, 50.0, 50.0]]])
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                  min_pos_iou=0.5)

        # hardness: high loss exactly for candidates 10..25
        def hardness_fn(boxes_all, labels_all):
            idx = jnp.arange(boxes_all.shape[1])
            return jnp.where((idx >= 10) & (idx < 26), 5.0, 0.1)[None, :]

        out = sample_rois_batch(
            jax.random.PRNGKey(0), props, jnp.ones((1, P), bool), gt,
            jnp.ones((1, 1), bool), jnp.ones((1, 1), jnp.int32), assigner,
            16, 0.25, sampler_cfg=dict(type="OHEMSampler"),
            hardness_fn=hardness_fn)
        sel_boxes, sel_pos, sel_valid = out[0], out[1], out[2]
        # the 16 selected (minus the gt-as-proposal positive) must come from
        # the hard range: match selected boxes back to the hard candidates
        hard = np.asarray(props[0, 10:26])
        chosen = np.asarray(sel_boxes[0])[np.asarray(sel_valid[0]) &
                                          ~np.asarray(sel_pos[0])]
        hits = sum(1 for c in chosen
                   if (np.abs(hard - c).max(axis=1) < 1e-4).any())
        assert hits == len(chosen) and hits >= 14, (hits, len(chosen))

    def test_ohem_detector_end_to_end(self):
        """Faster R-CNN with an OHEM sampler config trains with finite
        losses through the no-grad hardness pass."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from ioudet.models import build_detector

        det = build_detector(dict(
            type="FasterRCNN",
            backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                          norm_cfg=dict(type="FrozenBN")),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", num_classes=2, in_channels=32,
                          feat_channels=32, anchor_scales=(8,),
                          anchor_ratios=(0.5, 1.0, 2.0),
                          anchor_strides=(4, 8, 16, 32, 64),
                          loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                        gamma=2.0, alpha=0.25,
                                        loss_weight=1.0),
                          loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                         loss_weight=1.0)),
            bbox_roi_extractor=dict(type="SingleRoIExtractor",
                                    out_channels=32,
                                    featmap_strides=(4, 8, 16, 32),
                                    roi_layer=dict(out_size=7,
                                                   sample_num=2)),
            bbox_head=dict(type="SharedFCBBoxHead", num_classes=5,
                           in_channels=32, fc_out_channels=32)),
            dict(rpn=dict(assigner=dict(type="MaxIoUAssigner",
                                        pos_iou_thr=0.7, neg_iou_thr=0.3,
                                        min_pos_iou=0.3), allowed_border=0),
                 rpn_proposal=dict(nms_pre=100, max_num=48, nms_thr=0.7),
                 rcnn=dict(sampler=dict(type="OHEMSampler", num=24,
                                        pos_fraction=0.25))),
            dict(rpn=dict(nms_pre=50, max_num=16, nms_thr=0.7),
                 rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                           max_per_img=8)))
        rng = np.random.default_rng(3)
        B, G = 2, 2
        img = jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)), jnp.float32)
        xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
        batch = dict(img=img,
                     gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
                     gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)),
                                           jnp.int32),
                     gt_valid=jnp.ones((B, G), bool),
                     shape=jnp.tile(jnp.asarray([[64, 96]], jnp.int32),
                                    (B, 1)))
        variables = det.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(7)},
            img, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
            batch["shape"], batch["shape"], method=det.forward_train)
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["shape"], b["shape"], method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)}))(variables, batch)
        assert all(np.isfinite(float(v)) for v in losses.values())
