"""Regression tests for the round-1 advisor findings:

1. RPN-style anchor subsampling (RandomSampler 256 @ 0.5) + avg_factor =
   num_total_samples for non-focal cls losses (ref: mmdet AnchorHead
   sampling=True path).
2. Two-stage simple_test masks zero-padded proposal slots out of NMS.
3. FPN extra-conv ReLU gating matches the reference (no ReLU unless
   relu_before_extra_convs, never before the first extra conv).
4. COCO area-range gating uses ann['area'] (segmentation area), not bbox w*h.
5. Multi-host batch sampler pads to equal per-shard step counts.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ioudet.core import anchor_target, MaxIoUAssigner
from ioudet.core.bbox.samplers import RandomSampler, build_sampler
from ioudet.core.evaluation.coco_eval import CocoEvaluator
from ioudet.data import GroupedBatchSampler
from ioudet.models import build_detector
from ioudet.models.necks.fpn import FPN


class TestAnchorSampling:
    def _inputs(self, A=2000, G=4, B=2, seed=0):
        rng = np.random.default_rng(seed)
        # dense anchor grid so positives + many negatives exist
        cx = rng.uniform(10, 110, (A, 2)).astype(np.float32)
        anchors = np.concatenate([cx - 8, cx + 8], -1)
        xy = rng.uniform(10, 90, (B, G, 2)).astype(np.float32)
        gt = np.concatenate([xy, xy + 16], -1)
        return (jnp.asarray(anchors), jnp.ones((B, A), bool),
                jnp.asarray(gt), jnp.ones((B, G), bool),
                jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
                jnp.tile(jnp.asarray([[128, 128]], jnp.int32), (B, 1)))

    def test_sampler_caps_loss_participants(self):
        anchors, valid, gt, gv, gl, shapes = self._inputs()
        assigner = MaxIoUAssigner(0.5, 0.4, 0)
        sampler = RandomSampler(num=256, pos_fraction=0.5)
        t = anchor_target(anchors, valid, gt, gv, gl, shapes, assigner,
                          sampler=sampler, rng=jax.random.PRNGKey(0))
        B = valid.shape[0]
        lw = np.asarray(t.label_weights)
        # exactly 256 sampled anchors per image carry loss weight
        assert (lw > 0).sum(axis=1).max() <= 256
        assert int(t.num_total_pos + t.num_total_neg) <= 256 * B
        # positives capped at num * pos_fraction per image
        bw = np.asarray(t.bbox_weights)[..., 0]
        assert (bw > 0).sum(axis=1).max() <= 128
        # without a sampler every negative participates
        t0 = anchor_target(anchors, valid, gt, gv, gl, shapes, assigner)
        assert int(t0.num_total_neg) > 256 * B

    def test_unsampled_anchors_have_zero_weight(self):
        anchors, valid, gt, gv, gl, shapes = self._inputs()
        assigner = MaxIoUAssigner(0.5, 0.4, 0)
        sampler = build_sampler(dict(type="RandomSampler", num=64,
                                     pos_fraction=0.5))
        t = anchor_target(anchors, valid, gt, gv, gl, shapes, assigner,
                          sampler=sampler, rng=jax.random.PRNGKey(1))
        lw = np.asarray(t.label_weights)
        total = int(t.num_total_pos) + int(t.num_total_neg)
        assert int((lw > 0).sum()) == total

    def test_rpn_head_sampling_property_and_loss_scale(self):
        from ioudet.models.heads.rpn_head import RPNHead
        from ioudet.models.heads.retina_head import RetinaHead

        rpn = RPNHead(num_classes=2, in_channels=32, feat_channels=32,
                      anchor_scales=(8,), anchor_strides=(4, 8, 16, 32, 64),
                      loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                                    loss_weight=1.0))
        assert rpn.sampling  # BCE -> subsample
        retina = RetinaHead(num_classes=5, in_channels=32, feat_channels=32,
                            anchor_strides=(8, 16, 32, 64, 128),
                            loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                          gamma=2.0, alpha=0.25))
        assert not retina.sampling  # focal handles imbalance itself

        B, canvas = 2, (64, 96)
        feats = [jnp.zeros((B, canvas[0] // s, canvas[1] // s, 32))
                 for s in (4, 8, 16, 32, 64)]
        params = rpn.init(jax.random.PRNGKey(0), feats)["params"]
        rng = np.random.default_rng(0)
        xy = rng.uniform(0, 40, (B, 3, 2)).astype(np.float32)
        cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                 neg_iou_thr=0.3, min_pos_iou=0.3),
                   sampler=dict(type="RandomSampler", num=256,
                                pos_fraction=0.5),
                   allowed_border=0)
        outs = rpn.apply({"params": params}, feats)
        losses = rpn.apply(
            {"params": params}, *outs,
            jnp.asarray(np.concatenate([xy, xy + 20], -1)),
            jnp.ones((B, 3), jnp.int32), jnp.ones((B, 3), bool),
            jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1)),
            jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1)),
            cfg, method=rpn.loss,
            rngs={"sampler": jax.random.PRNGKey(3)})
        # BCE at init (logits ~0) is ~0.69 per anchor; with 256-sample
        # normalization the cls loss must be O(1), not O(1000) as in the
        # advisor-reported inflated form (sum over ~3e5 anchors / num_pos)
        assert float(losses["loss_cls"]) < 5.0
        assert np.isfinite(float(losses["loss_cls"]))
        assert np.isfinite(float(losses["loss_bbox"]))


class TestFPNExtraConvRelu:
    def _run(self, relu_flag):
        fpn = FPN(in_channels=(8, 16), out_channels=8, num_outs=4,
                  add_extra_convs=True, extra_convs_on_inputs=False,
                  relu_before_extra_convs=relu_flag)
        rng = np.random.default_rng(0)
        inputs = [jnp.asarray(rng.normal(0, 1, (1, 8, 8, c)), jnp.float32)
                  for c in (8, 16)]
        params = fpn.init(jax.random.PRNGKey(0), inputs)["params"]
        outs = fpn.apply({"params": params}, inputs)
        return params, outs

    @staticmethod
    def _conv(x, p):
        return jax.lax.conv_general_dilated(
            x, p["kernel"], window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]

    def test_no_relu_when_flag_false(self):
        params, outs = self._run(False)
        # P6 = conv(P5) with NO relu; P7 = conv(P6) with NO relu
        p6 = self._conv(outs[1], params["extra_0"]["conv"])
        np.testing.assert_allclose(np.asarray(outs[2]), np.asarray(p6),
                                   rtol=1e-5, atol=1e-5)
        p7 = self._conv(outs[2], params["extra_1"]["conv"])
        np.testing.assert_allclose(np.asarray(outs[3]), np.asarray(p7),
                                   rtol=1e-5, atol=1e-5)

    def test_relu_between_extras_when_flag_true(self):
        params, outs = self._run(True)
        # first extra conv still sees raw input (never ReLU'd) ...
        p6 = self._conv(outs[1], params["extra_0"]["conv"])
        np.testing.assert_allclose(np.asarray(outs[2]), np.asarray(p6),
                                   rtol=1e-5, atol=1e-5)
        # ... but the second gets a ReLU'd source
        p7 = self._conv(jax.nn.relu(outs[2]), params["extra_1"]["conv"])
        np.testing.assert_allclose(np.asarray(outs[3]), np.asarray(p7),
                                   rtol=1e-5, atol=1e-5)


class TestCocoAreaField:
    def _ev(self, gt_area):
        ev = CocoEvaluator(cat_ids=[1])
        gt = dict(bbox=[10.0, 10.0, 50.0, 50.0], category_id=1, iscrowd=0)
        if gt_area is not None:
            gt["area"] = gt_area
        ev.add_gt(0, [gt])
        # perfect-match detection (xyxy with the evaluator's +1 convention)
        ev.add_det_per_class(0, [np.array([[10, 10, 59, 59, 0.9]],
                                          np.float64)])
        return ev.evaluate()

    def test_segmentation_area_drives_range_gating(self):
        # bbox w*h = 2500 (medium) but segmentation area 500 (small):
        # pycocotools scores this gt in the small bin, not medium
        m = self._ev(gt_area=500.0)
        assert m["APs"] > 0.5          # counted as small
        assert m["APm"] == -1.0        # no medium gt remains
        # fallback: without ann['area'], bbox area governs (medium)
        m2 = self._ev(gt_area=None)
        assert m2["APm"] > 0.5
        assert m2["APs"] == -1.0


class TestShardPadding:
    def test_equal_steps_per_shard(self):
        flags = np.zeros(14, np.uint8)     # 7 batches of 2
        counts = []
        for shard in range(3):
            s = GroupedBatchSampler(flags, batch_size=2, shuffle=True,
                                    seed=0, num_shards=3, shard_index=shard)
            batches = list(s)
            counts.append(len(batches))
            assert len(s) == len(batches)  # __len__ agrees with iteration
        assert counts == [3, 3, 3]         # ceil(7/3), padded by re-sampling

    def test_single_shard_unchanged(self):
        flags = np.zeros(14, np.uint8)
        s = GroupedBatchSampler(flags, batch_size=2, shuffle=False, seed=0)
        assert len(list(s)) == len(s) == 7


class TestTwoStagePaddingMask:
    def test_invalid_proposals_produce_no_dets(self):
        cfg = dict(
            type="FasterRCNN",
            backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                          norm_cfg=dict(type="FrozenBN")),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", num_classes=2, in_channels=32,
                          feat_channels=32, anchor_scales=(8,),
                          anchor_ratios=(1.0,),
                          anchor_strides=(4, 8, 16, 32, 64),
                          loss_cls=dict(type="CrossEntropyLoss",
                                        use_sigmoid=True, loss_weight=1.0)),
            bbox_roi_extractor=dict(type="SingleRoIExtractor",
                                    out_channels=32,
                                    featmap_strides=(4, 8, 16, 32),
                                    roi_layer=dict(out_size=7, sample_num=2)),
            bbox_head=dict(type="SharedFCBBoxHead", num_classes=5,
                           in_channels=32, fc_out_channels=32))
        # rpn score threshold that no random-init proposal can pass is not
        # reachable via config; instead verify the mechanism: with score_thr
        # 0 in rcnn, padded rows must STILL never appear because valid=False
        test_cfg = dict(rpn=dict(nms_pre=64, max_num=32, nms_thr=0.7),
                        rcnn=dict(score_thr=0.0, nms=dict(iou_thr=0.5),
                                  max_per_img=8))
        det = build_detector(cfg, None, test_cfg)
        B, canvas = 1, (64, 96)
        img = jnp.zeros((B,) + canvas + (3,))
        shapes = jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1))
        variables = det.init(jax.random.PRNGKey(0), img, shapes,
                             jnp.ones((B,), jnp.float32), shapes,
                             method=det.simple_test)
        dets, labels = det.apply(
            variables, img, shapes, jnp.ones((B,), jnp.float32), shapes,
            method=det.simple_test)
        dets, labels = np.asarray(dets), np.asarray(labels)
        # every emitted det must come from a real proposal: rows whose score
        # is zero are padding and must carry label -1
        assert ((dets[..., 4] > 0) == (labels >= 0)).all()
