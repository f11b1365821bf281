"""Guided Anchoring head: forward/loss/decode smoke + target geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.models import build_detector


@pytest.fixture(scope="module")
def ga_setup():
    det = build_detector(dict(
        type="RetinaNet",  # GA drops into the single-stage shell
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
                  start_level=1, add_extra_convs=True, num_outs=5),
        bbox_head=dict(type="GARetinaHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1, octave_base_scale=8,
                       anchor_ratios=(0.5, 1.0, 2.0),
                       anchor_strides=(8, 16, 32, 64, 128))),
        dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                           neg_iou_thr=0.4, min_pos_iou=0),
             allowed_border=-1),
        dict(nms_pre=50, score_thr=0.01, nms=dict(iou_thr=0.5),
             max_per_img=10))
    rng = np.random.default_rng(0)
    B, G = 2, 3
    img = jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)), jnp.float32)
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    batch = dict(img=img,
                 gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
                 gt_labels=jnp.asarray(rng.integers(1, 4, (B, G)), jnp.int32),
                 gt_valid=jnp.ones((B, G), bool),
                 img_shape=jnp.tile(jnp.asarray([[64, 96]], jnp.int32), (B, 1)))
    variables = det.init(jax.random.PRNGKey(0), img)
    return det, variables, batch


class TestGuidedAnchor:
    def test_forward_shapes(self, ga_setup):
        det, variables, batch = ga_setup
        cls, reg, shape, loc = det.apply(variables, batch["img"])
        assert len(cls) == 5
        assert cls[0].shape == (2, 8, 12, 3)   # one anchor x 3 fg classes
        assert reg[0].shape == (2, 8, 12, 4)
        assert shape[0].shape == (2, 8, 12, 2)
        assert loc[0].shape == (2, 8, 12, 1)

    def test_losses(self, ga_setup):
        det, variables, batch = ga_setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], method=det.forward_train))(
                variables, batch)
        assert set(losses) == {"loss_cls", "loss_bbox", "loss_shape",
                               "loss_loc"}
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_simple_test(self, ga_setup):
        det, variables, batch = ga_setup
        dets, labels = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["img_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 10, 5)

    def test_predicted_anchor_decode(self, ga_setup):
        det, variables, batch = ga_setup
        head = det.bbox_head
        # zero shape pred -> anchors == squares
        fs = [(8, 12)]
        sp = [jnp.zeros((1, 8, 12, 2), jnp.float32)]
        anchors = head.predicted_anchors(sp, fs)[0]
        squares = head.square_generators()[0].grid_anchors((8, 12), 8)
        np.testing.assert_allclose(np.asarray(anchors)[0],
                                   np.asarray(squares), atol=1e-3)
