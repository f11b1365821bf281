"""Training stack: LR schedule values (mmcv parity), trainable masking,
loss-decreases-on-fixed-batch integration, checkpoint save/load round trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.apis.train import (build_optimizer, make_lr_schedule,
                               make_trainable_mask, make_train_step,
                               parse_losses)
from ioudet.apis.checkpoint import (save_checkpoint, load_checkpoint,
                                    latest_checkpoint)


class TestLrSchedule:
    def test_warmup_and_steps(self):
        sched = make_lr_schedule(
            0.01, dict(policy="step", warmup="linear", warmup_iters=500,
                       warmup_ratio=1.0 / 3, step=[8, 11]),
            iters_per_epoch=100, total_epochs=12)
        # t=0: lr = base * ratio
        np.testing.assert_allclose(float(sched(0)), 0.01 / 3, rtol=1e-5)
        # t=250: halfway: 1 - (1-1/3)/2 = 2/3
        np.testing.assert_allclose(float(sched(250)), 0.01 * 2 / 3, rtol=1e-5)
        # after warmup, full lr
        np.testing.assert_allclose(float(sched(600)), 0.01, rtol=1e-6)
        # epoch 8 (step >= 800): x0.1 ; epoch 11: x0.01
        np.testing.assert_allclose(float(sched(850)), 0.001, rtol=1e-5)
        np.testing.assert_allclose(float(sched(1150)), 0.0001, rtol=1e-5)


class TestTrainableMask:
    def test_frozen_bn_and_stages(self):
        params = {
            "backbone": {
                "conv1": {"kernel": np.zeros(1)},
                "bn1": {"scale": np.zeros(1), "mean": np.zeros(1),
                        "var": np.zeros(1)},
                "layer1_0": {"conv1": {"kernel": np.zeros(1)}},
                "layer2_0": {"conv1": {"kernel": np.zeros(1)},
                             "bn1": {"mean": np.zeros(1),
                                     "scale": np.zeros(1)}},
            },
            "bbox_head": {"retina_cls": {"kernel": np.zeros(1)}},
        }
        mask = make_trainable_mask(params, frozen_stages=1)
        assert not mask["backbone"]["conv1"]["kernel"]
        assert not mask["backbone"]["bn1"]["scale"]
        assert not mask["backbone"]["layer1_0"]["conv1"]["kernel"]
        assert mask["backbone"]["layer2_0"]["conv1"]["kernel"]
        assert not mask["backbone"]["layer2_0"]["bn1"]["mean"]  # stats frozen
        assert mask["backbone"]["layer2_0"]["bn1"]["scale"]
        assert mask["bbox_head"]["retina_cls"]["kernel"]


@pytest.fixture(scope="module")
def tiny_setup():
    from ioudet.models import build_detector

    cfg = dict(
        type="IoUAwareRetinaNet",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, add_extra_convs=True,
                  num_outs=5),
        bbox_head=dict(type="IoUAwareRetinaHead", num_classes=4,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       anchor_strides=(8, 16, 32, 64, 128),
                       loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                     gamma=2.0, alpha=0.25, loss_weight=1.0),
                       loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                      loss_weight=1.0)))
    train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                   neg_iou_thr=0.4, min_pos_iou=0,
                                   ignore_iof_thr=-1),
                     allowed_border=-1, pos_weight=-1)
    det = build_detector(cfg, train_cfg, None)
    rng = np.random.default_rng(0)
    B, G, canvas = 2, 4, (64, 64)
    xy = rng.uniform(0, 30, (B, G, 2)).astype(np.float32)
    batch = dict(
        img=jnp.asarray(rng.normal(0, 1, (B,) + canvas + (3,)), jnp.float32),
        gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 20], -1)),
        gt_labels=jnp.asarray(rng.integers(1, 4, (B, G)), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (B, 1)),
        pad_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (B, 1)),
    )
    params = det.init(jax.random.PRNGKey(0), batch["img"])["params"]
    params = jax.device_get(params)  # host copy: train steps donate buffers
    return det, params, batch


class TestTrainStep:
    def test_loss_decreases(self, tiny_setup):
        det, params, batch = tiny_setup
        params = jax.tree.map(jnp.asarray, params)  # fresh device buffers
        # lr matched to the tiny random-init model (full-size configs rely
        # on warmup for the first 500 iters)
        sched = lambda step: 0.003
        tx = build_optimizer(dict(type="SGD", lr=0.003, momentum=0.9,
                                  weight_decay=1e-4), sched)
        state = dict(params=params, opt_state=tx.init(params),
                     step=jnp.zeros((), jnp.int32))
        step_fn = make_train_step(det, tx)
        history = []
        for i in range(12):
            state, logs = step_fn(state, batch)
            history.append(float(logs["loss"]))
        assert np.mean(history[-3:]) < history[0], history
        assert int(state["step"]) == 12

    def test_grad_clip(self, tiny_setup):
        det, params, batch = tiny_setup
        params = jax.tree.map(jnp.asarray, params)
        tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9),
                             lambda s: 0.01, grad_clip=dict(max_norm=0.01))
        state = dict(params=params, opt_state=tx.init(params),
                     step=jnp.zeros((), jnp.int32))
        step_fn = make_train_step(det, tx)
        state, logs = step_fn(state, batch)
        assert np.isfinite(float(logs["loss"]))


class TestCheckpoint:
    def test_roundtrip(self, tiny_setup, tmp_path):
        det, params, batch = tiny_setup
        state = dict(params=params, step=jnp.asarray(7, jnp.int32))
        path = save_checkpoint(str(tmp_path), "epoch_1", state,
                               meta=dict(epoch=1, CLASSES=("a", "b")))
        assert latest_checkpoint(str(tmp_path)) == path
        target = jax.tree.map(jnp.zeros_like, state)
        restored, meta = load_checkpoint(path, target)
        assert int(restored["step"]) == 7
        assert meta["epoch"] == 1 and list(meta["CLASSES"]) == ["a", "b"]
        leaves0 = jax.tree.leaves(state["params"])
        leaves1 = jax.tree.leaves(restored["params"])
        for a, b in zip(leaves0, leaves1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_without_target(self, tiny_setup, tmp_path):
        det, params, batch = tiny_setup
        save_checkpoint(str(tmp_path), "ck", dict(params=params))
        raw, _ = load_checkpoint(os.path.join(str(tmp_path), "ck"))
        assert "params" in raw and "backbone" in raw["params"]


class TestParseLosses:
    def test_sums_loss_keys_only(self):
        losses = dict(loss_cls=jnp.asarray(1.0), loss_bbox=jnp.asarray(2.0),
                      acc=jnp.asarray(99.0))
        total, log_vars = parse_losses(losses)
        assert float(total) == 3.0
        assert float(log_vars["loss"]) == 3.0

    def test_sums_prefixed_stage_losses(self):
        """rpn_loss_* and s{N}_loss_* must count toward the total (the
        two-stage/cascade loss keys)."""
        losses = dict(loss_cls=jnp.asarray(1.0),
                      rpn_loss_cls=jnp.asarray(2.0),
                      s0_loss_bbox=jnp.asarray(4.0),
                      acc=jnp.asarray(99.0))
        total, _ = parse_losses(losses)
        assert float(total) == 7.0
