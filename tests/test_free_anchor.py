"""FreeAnchor head: bag loss properties + end-to-end smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.models import build_detector
from ioudet.models.heads import FreeAnchorRetinaHead


class TestBagLoss:
    def head(self):
        return FreeAnchorRetinaHead(num_classes=4, in_channels=32,
                                    feat_channels=32, pre_anchor_topk=4)

    def test_positive_bag_loss_decreases_with_prob(self):
        h = self.head()
        low = h.positive_bag_loss(jnp.full((1, 4), 0.1), jnp.ones((1, 4)))
        high = h.positive_bag_loss(jnp.full((1, 4), 0.9), jnp.ones((1, 4)))
        assert float(high[0]) < float(low[0])

    def test_negative_bag_loss_zero_when_matched(self):
        h = self.head()
        # fully matched anchors (box_prob=1) contribute nothing
        v = h.negative_bag_loss(jnp.asarray([0.9]), jnp.asarray([1.0]))
        assert float(v[0]) < 1e-6
        v2 = h.negative_bag_loss(jnp.asarray([0.9]), jnp.asarray([0.0]))
        assert float(v2[0]) > 0.1


class TestFreeAnchorEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self):
        det = build_detector(dict(
            type="RetinaNet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                          norm_cfg=dict(type="FrozenBN")),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, start_level=1, add_extra_convs=True,
                      num_outs=5),
            bbox_head=dict(type="FreeAnchorRetinaHead", num_classes=4,
                           in_channels=32, feat_channels=32, stacked_convs=1,
                           anchor_strides=(8, 16, 32, 64, 128),
                           pre_anchor_topk=16)),
            dict(),
            dict(nms_pre=50, score_thr=0.01, nms=dict(iou_thr=0.5),
                 max_per_img=10))
        rng = np.random.default_rng(0)
        B, G = 2, 3
        img = jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)), jnp.float32)
        xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
        batch = dict(
            img=img,
            gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
            gt_labels=jnp.asarray(rng.integers(1, 4, (B, G)), jnp.int32),
            gt_valid=jnp.ones((B, G), bool),
            img_shape=jnp.tile(jnp.asarray([[64, 96]], jnp.int32), (B, 1)))
        variables = det.init(jax.random.PRNGKey(0), img)
        return det, variables, batch

    def test_losses_finite_and_grads_flow(self, setup):
        det, variables, batch = setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], method=det.forward_train))(
                variables, batch)
        assert all(np.isfinite(float(v)) for v in losses.values())

        def total(p):
            return sum(det.apply({"params": p}, batch["img"],
                                 batch["gt_bboxes"], batch["gt_labels"],
                                 batch["gt_valid"], batch["img_shape"],
                                 batch["img_shape"],
                                 method=det.forward_train).values())

        g = jax.jit(jax.grad(total))(variables["params"])
        gnorm = float(jnp.sqrt(sum(jnp.sum(x * x)
                                   for x in jax.tree.leaves(g))))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_inference_inherited(self, setup):
        det, variables, batch = setup
        dets, labels = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["img_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 10, 5)
