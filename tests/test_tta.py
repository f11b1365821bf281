"""Multi-scale/flip TTA: view generation, box mapping round trip, and the
full aug_test merge on a tiny detector."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.core.bbox import bbox_mapping, bbox_mapping_back
from ioudet.core.post_processing import merge_aug_bboxes


class TestMapping:
    def test_round_trip(self):
        b = np.array([[10, 20, 50, 80]], np.float32)
        img_shape = (200, 300)
        for flip in (False, True):
            mapped = bbox_mapping(jnp.asarray(b), img_shape, 2.0, flip)
            back = np.asarray(bbox_mapping_back(mapped, img_shape, 2.0, flip))
            np.testing.assert_allclose(back, b, atol=1e-4)

    def test_merge_concats_in_original_space(self):
        b1 = jnp.asarray([[20, 40, 100, 160]], jnp.float32)  # view at x2
        b2 = jnp.asarray([[10, 20, 50, 80]], jnp.float32)    # original scale
        s1 = jnp.asarray([[0.9]], jnp.float32)
        s2 = jnp.asarray([[0.8]], jnp.float32)
        metas = [dict(img_shape=(400, 600), scale_factor=2.0, flip=False),
                 dict(img_shape=(200, 300), scale_factor=1.0, flip=False)]
        boxes, scores = merge_aug_bboxes([b1, b2], [s1, s2], metas)
        assert boxes.shape == (2, 4)
        np.testing.assert_allclose(np.asarray(boxes)[0],
                                   np.asarray(boxes)[1], atol=1e-4)


class TestMultiScaleFlipAug:
    def test_views(self):
        from ioudet.data.pipelines.test_aug import MultiScaleFlipAug
        aug = MultiScaleFlipAug(
            transforms=[
                dict(type="Resize", keep_ratio=True),
                dict(type="RandomFlip", flip_ratio=0.0),
                dict(type="Normalize", mean=(0, 0, 0), std=(1, 1, 1),
                     to_rgb=False),
                dict(type="Pad", size_divisor=32, size=(64, 96)),
                dict(type="Collect", keys=["img"]),
            ],
            img_scale=[(96, 64), (64, 48)], flip=True)
        rng = np.random.default_rng(0)
        sample = dict(img=rng.integers(0, 255, (48, 72, 3), np.uint8),
                      img_shape=(48, 72), ori_shape=(48, 72),
                      channel_order="rgb")
        views = aug(sample)
        assert len(views) == 4  # 2 scales x 2 flips
        flips = [bool(v["flip"]) for v in views]
        assert flips == [False, True, False, True]
        assert views[0]["img"].shape == views[1]["img"].shape

    def test_aug_test_end_to_end(self):
        from ioudet.apis.test import aug_test
        from ioudet.models import build_detector

        det = build_detector(dict(
            type="IoUAwareRetinaNet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                          norm_cfg=dict(type="FrozenBN")),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, start_level=1, add_extra_convs=True,
                      num_outs=5),
            bbox_head=dict(type="IoUAwareRetinaHead", num_classes=3,
                           in_channels=32, feat_channels=32, stacked_convs=1,
                           anchor_strides=(8, 16, 32, 64, 128))),
            None,
            dict(nms_pre=50, score_thr=0.01, nms=dict(iou_thr=0.5),
                 max_per_img=10, rescoring_alpha=0.5))
        rng = np.random.default_rng(1)
        img1 = rng.normal(0, 1, (64, 96, 3)).astype(np.float32)
        params = det.init(jax.random.PRNGKey(0),
                          jnp.asarray(img1)[None])["params"]
        samples = [
            dict(img=img1, img_shape=np.asarray([60, 90], np.int32),
                 scale_factor=1.0, flip=False),
            dict(img=img1[:, ::-1].copy(),
                 img_shape=np.asarray([60, 90], np.int32),
                 scale_factor=1.0, flip=True),
        ]
        dets, labels = aug_test(det, params, samples,
                                dict(nms_pre=50, score_thr=0.01,
                                     nms=dict(iou_thr=0.5), max_per_img=10,
                                     rescoring_alpha=0.5))
        assert dets.shape == (10, 5) and labels.shape == (10,)
        assert np.isfinite(dets).all()
