"""Detector forward/loss/test smoke on fake data (ref: tests/test_forward.py):
build from a real config, random weights, assert finite losses and valid
fixed-shape outputs.  Small canvas keeps compiles fast."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def small_model_cfg(head_type="IoUAwareRetinaHead", det_type="IoUAwareRetinaNet",
                    depth=18):
    in_ch = [64, 128, 256, 512] if depth == 18 else [256, 512, 1024, 2048]
    return dict(
        type=det_type,
        backbone=dict(type="ResNet", depth=depth, frozen_stages=1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=in_ch, out_channels=64,
                  start_level=1, add_extra_convs=True, num_outs=5),
        bbox_head=dict(type=head_type, num_classes=11, in_channels=64,
                       feat_channels=64, stacked_convs=1,
                       anchor_strides=(8, 16, 32, 64, 128),
                       loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                     gamma=2.0, alpha=0.25, loss_weight=1.0),
                       loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                      loss_weight=1.0)))


TRAIN_CFG = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                               neg_iou_thr=0.4, min_pos_iou=0,
                               ignore_iof_thr=-1),
                 allowed_border=-1, pos_weight=-1)
TEST_CFG = dict(nms_pre=200, score_thr=0.05, nms=dict(type="nms", iou_thr=0.5),
                max_per_img=20, rescoring_alpha=0.5)


def fake_batch(B=2, G=5, canvas=(64, 96)):
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    return dict(
        img=jnp.asarray(rng.normal(0, 1, (B,) + canvas + (3,)), jnp.float32),
        gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 15], -1)),
        gt_labels=jnp.asarray(rng.integers(1, 11, (B, G)), jnp.int32),
        gt_valid=jnp.asarray([[True, True, True, False, False]] * B),
        img_shape=jnp.tile(jnp.asarray([[60, 90]], jnp.int32), (B, 1)),
        pad_shape=jnp.tile(jnp.asarray([[64, 96]], jnp.int32), (B, 1)),
    )


@pytest.fixture(scope="module")
def iou_aware_model():
    from ioudet.models import build_detector
    det = build_detector(small_model_cfg(), TRAIN_CFG, TEST_CFG)
    batch = fake_batch()
    variables = det.init(jax.random.PRNGKey(0), batch["img"])
    return det, variables, batch


class TestIoUAwareForward:
    def test_forward_shapes(self, iou_aware_model):
        det, variables, batch = iou_aware_model
        cls, box, iou = jax.jit(det.apply)(variables, batch["img"])
        assert len(cls) == len(box) == len(iou) == 5
        assert cls[0].shape == (2, 8, 12, 9 * 10)
        assert box[0].shape == (2, 8, 12, 9 * 4)
        assert iou[0].shape == (2, 8, 12, 9)

    def test_loss_finite(self, iou_aware_model):
        det, variables, batch = iou_aware_model
        losses = jax.jit(
            lambda v, b: det.apply(v, b["img"], b["gt_bboxes"], b["gt_labels"],
                                   b["gt_valid"], b["img_shape"],
                                   b["pad_shape"], method=det.forward_train)
        )(variables, batch)
        assert set(losses) == {"loss_cls", "loss_bbox", "loss_iou"}
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_loss_differentiable(self, iou_aware_model):
        det, variables, batch = iou_aware_model

        def total(params):
            losses = det.apply({"params": params}, batch["img"],
                               batch["gt_bboxes"], batch["gt_labels"],
                               batch["gt_valid"], batch["img_shape"],
                               batch["pad_shape"], method=det.forward_train)
            return sum(losses.values())

        grads = jax.jit(jax.grad(total))(variables["params"])
        gnorm = float(jnp.sqrt(sum(jnp.sum(g * g)
                                   for g in jax.tree.leaves(grads))))
        assert np.isfinite(gnorm) and gnorm > 0
        # frozen stage conv must get zero grads (stop_gradient)
        stem = grads["backbone"]["conv1"]["kernel"]
        assert float(jnp.abs(stem).max()) == 0.0
        head = grads["bbox_head"]["retina_iou"]["kernel"]
        assert float(jnp.abs(head).max()) > 0.0

    def test_simple_test_fixed_shape(self, iou_aware_model):
        det, variables, batch = iou_aware_model
        dets, labels = jax.jit(
            lambda v, b: det.apply(v, b["img"], b["img_shape"],
                                   jnp.ones((2,), jnp.float32),
                                   b["pad_shape"], method=det.simple_test)
        )(variables, batch)
        assert dets.shape == (2, 20, 5)
        assert labels.shape == (2, 20)
        lab = np.asarray(labels)
        assert ((lab >= -1) & (lab < 10)).all()


class TestVanillaRetina:
    def test_forward_and_loss(self):
        from ioudet.models import build_detector
        det = build_detector(small_model_cfg("RetinaHead", "RetinaNet"),
                             TRAIN_CFG, TEST_CFG)
        batch = fake_batch()
        variables = det.init(jax.random.PRNGKey(1), batch["img"])
        cls, box = jax.jit(det.apply)(variables, batch["img"])
        assert len(cls) == 5
        losses = jax.jit(
            lambda v, b: det.apply(v, b["img"], b["gt_bboxes"], b["gt_labels"],
                                   b["gt_valid"], b["img_shape"],
                                   b["pad_shape"], method=det.forward_train)
        )(variables, batch)
        assert set(losses) == {"loss_cls", "loss_bbox"}
        assert all(np.isfinite(float(v)) for v in losses.values())

    def test_focal_init_prior(self):
        """cls bias init -log((1-.01)/.01) -> initial fg prob ~ 0.01."""
        from ioudet.models import build_detector
        det = build_detector(small_model_cfg("RetinaHead", "RetinaNet"),
                             TRAIN_CFG, TEST_CFG)
        batch = fake_batch()
        variables = det.init(jax.random.PRNGKey(2), batch["img"])
        cls, _ = det.apply(variables, batch["img"])
        p = jax.nn.sigmoid(np.asarray(cls[0])).mean()
        assert 0.005 < float(p) < 0.02
