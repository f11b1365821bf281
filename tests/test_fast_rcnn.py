"""FastRCNN — the precomputed-proposal detector (VERDICT r2 item 5).

Covers: the pipeline proposal path (LoadProposals fixed-shape padding,
Resize/RandomFlip transforming proposals alongside GT), the FastRCNN /
FastMaskRCNN forward_train + simple_test contracts, and the full
train->eval wiring through train_detector/single_device_test with a
proposal_file dataset.

Ref: mmdet/models/detectors/fast_rcnn.py, mmdet/datasets/pipelines/
loading.py (LoadProposals), mmdet/datasets/custom.py (proposal_file)."""

import json
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.models import build_detector


def _fast_cfg(with_mask=False):
    cfg = dict(
        type="FastMaskRCNN" if with_mask else "FastRCNN",
        backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        bbox_roi_extractor=dict(type="SingleRoIExtractor", out_channels=64,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=7, sample_num=2)),
        bbox_head=dict(type="SharedFCBBoxHead", num_classes=5,
                       in_channels=64, fc_out_channels=64,
                       target_stds=(0.1, 0.1, 0.2, 0.2)))
    if with_mask:
        cfg.update(
            mask_roi_extractor=dict(type="SingleRoIExtractor",
                                    out_channels=64,
                                    featmap_strides=(4, 8, 16, 32),
                                    roi_layer=dict(out_size=14,
                                                   sample_num=2)),
            mask_head=dict(type="FCNMaskHead", num_convs=2, in_channels=64,
                           conv_out_channels=64, num_classes=5))
    return cfg


TRAIN_CFG = dict(rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                         min_pos_iou=0.5),
                           sampler=dict(num=16, pos_fraction=0.25)))
TEST_CFG = dict(rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                          max_per_img=8))


def _batch(B=2, G=3, P=16, canvas=(64, 96), seed=0, masks=False):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    gt = np.concatenate([xy, xy + 25], -1)
    # proposals: jittered copies of the GT + random negatives
    jitter = gt[:, :, None, :] + rng.normal(0, 3, (B, G, 3, 4)).astype(
        np.float32)
    rand = rng.uniform(0, 50, (B, P - 3 * G, 4)).astype(np.float32)
    rand = np.concatenate([rand[..., :2], rand[..., :2] + 12], -1)
    props = np.concatenate([jitter.reshape(B, 3 * G, 4), rand], 1)
    props = np.clip(props, 0, 90)
    props[..., 2] = np.maximum(props[..., 2], props[..., 0] + 2)
    props[..., 3] = np.maximum(props[..., 3], props[..., 1] + 2)
    out = dict(
        img=jnp.asarray(rng.normal(0, 1, (B,) + canvas + (3,)), jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        img_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1)),
        pad_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1)),
        proposals=jnp.asarray(props),
        prop_valid=jnp.ones((B, P), bool))
    if masks:
        out["gt_masks"] = jnp.asarray(
            (rng.uniform(size=(B, G, 112, 112)) > 0.4).astype(np.uint8))
    return out


class TestFastRCNNForward:
    def test_train_losses_finite(self):
        det = build_detector(_fast_cfg(), TRAIN_CFG, TEST_CFG)
        b = _batch()
        variables = det.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(1)},
            b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["pad_shape"], proposals=b["proposals"],
            prop_valid=b["prop_valid"], method=det.forward_train)
        losses = det.apply(variables, b["img"], b["gt_bboxes"],
                           b["gt_labels"], b["gt_valid"], b["img_shape"],
                           b["pad_shape"], proposals=b["proposals"],
                           prop_valid=b["prop_valid"],
                           method=det.forward_train,
                           rngs={"sampler": jax.random.PRNGKey(2)})
        assert set(losses) == {"loss_cls", "loss_bbox"}
        for v in losses.values():
            assert np.isfinite(float(v))

    def test_grads_flow(self):
        det = build_detector(_fast_cfg(), TRAIN_CFG, TEST_CFG)
        b = _batch()
        variables = det.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(1)},
            b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["pad_shape"], proposals=b["proposals"],
            prop_valid=b["prop_valid"], method=det.forward_train)

        def loss_fn(params):
            losses = det.apply({"params": params}, b["img"], b["gt_bboxes"],
                               b["gt_labels"], b["gt_valid"], b["img_shape"],
                               b["pad_shape"], proposals=b["proposals"],
                               prop_valid=b["prop_valid"],
                               method=det.forward_train,
                               rngs={"sampler": jax.random.PRNGKey(2)})
            return sum(jnp.sum(v) for v in losses.values())

        grads = jax.grad(loss_fn)(variables["params"])
        leaf = grads["bbox_head"]["fc_cls"]["kernel"]
        assert float(jnp.abs(leaf).sum()) > 0

    def test_simple_test_shapes_and_padding_masked(self):
        det = build_detector(_fast_cfg(), TRAIN_CFG, TEST_CFG)
        b = _batch()
        variables = det.init(
            jax.random.PRNGKey(0), b["img"], b["img_shape"],
            jnp.ones((2,), jnp.float32), b["pad_shape"],
            proposals=b["proposals"], prop_valid=b["prop_valid"],
            method=det.simple_test)
        # invalidate half the proposals: outputs must not change when the
        # invalid slots' boxes are scrambled
        pv = np.ones((2, 16), bool)
        pv[:, 8:] = False
        props2 = np.asarray(b["proposals"]).copy()
        props2[:, 8:] = [[1.0, 1.0, 60.0, 60.0]]
        d1, l1 = det.apply(variables, b["img"], b["img_shape"],
                           jnp.ones((2,), jnp.float32), b["pad_shape"],
                           proposals=b["proposals"],
                           prop_valid=jnp.asarray(pv),
                           method=det.simple_test)
        d2, l2 = det.apply(variables, b["img"], b["img_shape"],
                           jnp.ones((2,), jnp.float32), b["pad_shape"],
                           proposals=jnp.asarray(props2),
                           prop_valid=jnp.asarray(pv),
                           method=det.simple_test)
        assert d1.shape == (2, 8, 5) and l1.shape == (2, 8)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

    def test_mask_variant(self):
        det = build_detector(_fast_cfg(with_mask=True), TRAIN_CFG, TEST_CFG)
        b = _batch(masks=True)
        variables = det.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(1)},
            b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["pad_shape"], proposals=b["proposals"],
            prop_valid=b["prop_valid"], gt_masks=b["gt_masks"],
            method=det.forward_train)
        losses = det.apply(variables, b["img"], b["gt_bboxes"],
                           b["gt_labels"], b["gt_valid"], b["img_shape"],
                           b["pad_shape"], proposals=b["proposals"],
                           prop_valid=b["prop_valid"],
                           gt_masks=b["gt_masks"],
                           method=det.forward_train,
                           rngs={"sampler": jax.random.PRNGKey(2)})
        assert "loss_mask" in losses
        for v in losses.values():
            assert np.isfinite(float(v))
        dets, labels, masks = det.apply(
            variables, b["img"], b["img_shape"], jnp.ones((2,), jnp.float32),
            b["pad_shape"], proposals=b["proposals"],
            prop_valid=b["prop_valid"], method=det.simple_test)
        assert masks.shape == (2, 8, 28, 28)


class TestProposalPipeline:
    def test_load_proposals_pads_and_sorts(self):
        from ioudet.data.pipelines.loading import LoadProposals
        props = np.array([[0, 0, 10, 10, 0.3], [5, 5, 20, 20, 0.9]],
                         np.float32)
        out = LoadProposals(num_max_proposals=4)(dict(proposals=props))
        assert out["proposals"].shape == (4, 4)
        # score-sorted: the 0.9 proposal first, score column dropped
        np.testing.assert_allclose(out["proposals"][0], [5, 5, 20, 20])
        np.testing.assert_array_equal(out["prop_valid"],
                                      [True, True, False, False])
        np.testing.assert_allclose(out["proposals"][2:], 0)

    def test_resize_flip_track_gt(self):
        """Proposals must go through exactly the same geometry as
        gt_bboxes."""
        from ioudet.data.pipelines.transforms import RandomFlip, Resize
        box = np.array([[8.0, 4.0, 32.0, 20.0]], np.float32)
        results = dict(img=np.zeros((50, 80, 3), np.float32),
                       gt_bboxes=box.copy(), proposals=box.copy(),
                       prop_valid=np.array([True]))
        results = Resize(img_scale=(40, 25), keep_ratio=True)(results)
        results["flip_override"] = True
        results = RandomFlip()(results)
        np.testing.assert_allclose(results["proposals"],
                                   results["gt_bboxes"])

    def test_flip_keeps_padding_zero(self):
        from ioudet.data.pipelines.transforms import RandomFlip
        results = dict(img=np.zeros((20, 30, 3), np.float32),
                       img_shape=(20, 30),
                       proposals=np.array([[2.0, 2.0, 8.0, 8.0],
                                           [0.0, 0.0, 0.0, 0.0]],
                                          np.float32),
                       prop_valid=np.array([True, False]),
                       flip_override=True)
        out = RandomFlip()(results)
        np.testing.assert_allclose(out["proposals"][1], 0.0)


class TestFastRCNNEndToEnd:
    @pytest.fixture(scope="class")
    def coco_with_proposals(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("fastrcnn")
        rng = np.random.default_rng(3)
        from PIL import Image
        img_dir = tmp / "imgs"
        img_dir.mkdir()
        images, annotations, proposals = [], [], []
        for i in range(8):
            h, w = 64, 96
            arr = rng.integers(0, 60, (h, w, 3), np.uint8)
            bw, bh = 28, 24
            x = int(rng.integers(4, w - bw - 4))
            y = int(rng.integers(4, h - bh - 4))
            arr[y:y + bh, x:x + bw] = [250, 40, 40]
            Image.fromarray(arr).save(img_dir / f"{i}.jpg")
            images.append(dict(id=i, file_name=f"{i}.jpg", width=w,
                               height=h))
            annotations.append(dict(id=i, image_id=i, category_id=1,
                                    bbox=[x, y, bw, bh], area=bw * bh,
                                    iscrowd=0))
            # proposals: the gt box jittered + noise boxes, with scores
            p = np.concatenate([
                np.array([[x, y, x + bw - 1, y + bh - 1, 0.9]], np.float32)
                + rng.normal(0, 1, (6, 5)).astype(np.float32),
                rng.uniform(0, 40, (10, 5)).astype(np.float32)])
            p[:, 2] = np.maximum(p[:, 2], p[:, 0] + 4)
            p[:, 3] = np.maximum(p[:, 3], p[:, 1] + 4)
            proposals.append(np.clip(p, 0, 95))
        ann = tmp / "ann.json"
        ann.write_text(json.dumps(dict(
            images=images, annotations=annotations,
            categories=[dict(id=1, name="thing")])))
        prop_file = tmp / "props.pkl"
        with open(prop_file, "wb") as f:
            pickle.dump(proposals, f)
        return str(ann), str(img_dir), str(prop_file), str(tmp)

    def test_train_and_eval(self, coco_with_proposals):
        from ioudet.apis import single_device_test, train_detector
        from ioudet.data import build_dataset
        from ioudet.utils.config import Config

        ann, img_dir, prop_file, tmp = coco_with_proposals
        norm = dict(mean=(30.0, 30.0, 30.0), std=(60.0, 60.0, 60.0),
                    to_rgb=False)
        pipe_train = [
            dict(type="LoadImageFromFile"),
            dict(type="LoadProposals", num_max_proposals=16),
            dict(type="LoadAnnotations", with_bbox=True),
            dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
            dict(type="RandomFlip", flip_ratio=0.5),
            dict(type="Normalize", **norm),
            dict(type="Pad", size_divisor=32, size=(64, 96)),
            dict(type="DefaultFormatBundle", max_gt=3),
            dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                                       "gt_valid", "proposals",
                                       "prop_valid"]),
        ]
        pipe_test = [
            dict(type="LoadImageFromFile"),
            dict(type="LoadProposals", num_max_proposals=16),
            dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
            dict(type="Normalize", **norm),
            dict(type="Pad", size_divisor=32, size=(64, 96)),
            dict(type="Collect", keys=["img", "proposals", "prop_valid"]),
        ]
        model = dict(_fast_cfg(), backbone=dict(
            type="ResNet", depth=18, frozen_stages=-1,
            norm_cfg=dict(type="FrozenBN")))
        model["bbox_head"] = dict(model["bbox_head"], num_classes=2)
        cfg = Config.fromdict(dict(
            model=model,
            train_cfg=TRAIN_CFG, test_cfg=TEST_CFG,
            data=dict(imgs_per_gpu=4, workers_per_gpu=1,
                      train=dict(type="CocoDataset", ann_file=ann,
                                 img_prefix=img_dir,
                                 proposal_file=prop_file,
                                 pipeline=pipe_train),
                      val=dict(type="CocoDataset", ann_file=ann,
                               img_prefix=img_dir,
                               proposal_file=prop_file,
                               pipeline=pipe_test, test_mode=True)),
            optimizer=dict(type="SGD", lr=0.002, momentum=0.9,
                           weight_decay=0.0001),
            optimizer_config=dict(grad_clip=dict(max_norm=35)),
            lr_config=dict(policy="step", warmup="linear", warmup_iters=4,
                           warmup_ratio=0.1, step=[100]),
            checkpoint_config=dict(interval=1000),
            log_config=dict(interval=10),
            total_epochs=2,
            work_dir=str(tmp) + "/work",
        ))
        det = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                             cfg.get("test_cfg"))
        dataset = build_dataset(cfg.data["train"])
        state = train_detector(det, dataset, cfg, cfg.work_dir, n_devices=2)
        assert int(jax.device_get(state["step"])) > 0

        val = build_dataset(cfg.data["val"])
        params = jax.tree.map(jnp.asarray, state["params"])
        results = single_device_test(det, params, val, imgs_per_batch=4,
                                     progress=False)
        assert len(results) == 8
        assert all(len(r) == 1 for r in results)  # 1 fg class
