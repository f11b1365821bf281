"""GSPMD data-parallel training on the 8-device CPU mesh — the multi-chip
story the reference could only test manually on a GPU rig (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.parallel import make_mesh, shard_batch, batch_sharding, replicated


def small_detector():
    from ioudet.models import build_detector

    cfg = dict(
        type="IoUAwareRetinaNet",
        backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
                  start_level=1, add_extra_convs=True, num_outs=5),
        bbox_head=dict(type="IoUAwareRetinaHead", num_classes=5,
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
    return build_detector(cfg, train_cfg, None)


def fake_batch(B, canvas=(64, 64), G=4, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 30, (B, G, 2)).astype(np.float32)
    return dict(
        img=jnp.asarray(rng.normal(0, 1, (B,) + canvas + (3,)), jnp.float32),
        gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 20], -1)),
        gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (B, 1)),
        pad_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (B, 1)),
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
class TestDataParallel:
    def test_mesh_and_sharding(self):
        mesh = make_mesh(8)
        assert mesh.devices.shape == (8,)
        batch = fake_batch(8)
        sharded = shard_batch(mesh, batch)
        img = sharded["img"]
        assert img.sharding.is_equivalent_to(batch_sharding(mesh), img.ndim)

    def test_spmd_train_step_matches_single_device(self):
        """8-way data-parallel gradients == single-device gradients on the
        same global batch (the allreduce correctness check)."""
        from ioudet.apis.train import build_optimizer, make_train_step

        det = small_detector()
        batch = fake_batch(8)
        params = det.init(jax.random.PRNGKey(0), batch["img"][:1])["params"]
        params = jax.device_get(params)
        tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9), lambda s: 0.01)

        def run(mesh):
            p = jax.tree.map(jnp.asarray, params)
            state = dict(params=p, opt_state=tx.init(p),
                         step=jnp.zeros((), jnp.int32))
            step = make_train_step(det, tx, mesh)
            b = shard_batch(mesh, batch) if mesh else batch
            state, logs = step(state, b)
            return jax.device_get(state["params"]), float(logs["loss"])

        p_multi, loss_multi = run(make_mesh(8))
        p_single, loss_single = run(None)
        np.testing.assert_allclose(loss_multi, loss_single, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(p_multi), jax.tree.leaves(p_single)):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)

    def test_sharded_inference(self):
        from ioudet.apis.test import make_predict_fn

        det = small_detector().clone(
            test_cfg=dict(nms_pre=100, score_thr=0.05,
                          nms=dict(iou_thr=0.5), max_per_img=10))
        batch = fake_batch(8)
        params = det.init(jax.random.PRNGKey(0), batch["img"][:1])["params"]
        mesh = make_mesh(8)
        predict = make_predict_fn(det, mesh)
        from ioudet.parallel import shard_batch as sb
        b = sb(mesh, dict(img=batch["img"], img_shape=batch["img_shape"],
                          pad_shape=batch["pad_shape"],
                          scale_factor=jnp.ones((8,), jnp.float32)))
        params_r = jax.device_put(params, replicated(mesh))
        dets, labels = predict(params_r, b["img"], b["img_shape"],
                               b["scale_factor"], b["pad_shape"])
        assert dets.shape == (8, 10, 5)

    def test_graft_entry_dryrun(self):
        """The driver's multichip dry-run contract, in-process."""
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
