"""Segmentation (mask) evaluation end to end: RLE codec format/round-trip,
mask IoU, segm COCOeval protocol, and a scored Mask R-CNN smoke test (ref:
pycocotools maskUtils encode/decode/iou + COCOeval iouType='segm' as used by
mmdet coco_utils.results2json/coco_eval; VERDICT r1 item 4)."""

import json

import numpy as np
import pytest

from ioudet.core.mask import rle as R
from ioudet.core.evaluation.coco_eval import CocoEvaluator


class TestRLECodec:
    def test_round_trip_random(self):
        rng = np.random.default_rng(0)
        for _ in range(30):
            h, w = rng.integers(1, 80, 2)
            m = (rng.random((h, w)) > rng.random()).astype(np.uint8)
            assert (R.decode(R.encode(m)) == m).all()
            assert R.area(R.encode(m)) == m.sum()

    def test_string_format_golden(self):
        """Hand-derived against the published pycocotools rleToString
        algorithm: diff coding starts at the 4th element (i > 2), so
        [5,3,1] -> '531' verbatim and [5,3,1,1] diff-codes the last to
        1-3=-2 -> 0x1e with sign bit -> chr(30+48)='N'."""
        assert R.counts_to_string([5, 3, 1]) == "531"
        assert R.string_to_counts("531") == [5, 3, 1]
        assert R.counts_to_string([5, 3, 1, 1]) == "531N"
        assert R.string_to_counts("531N") == [5, 3, 1, 1]

    def test_multiword_counts(self):
        # counts >= 32 need the 0x20 continuation bit
        for c in ([40], [100000, 31, 32], [0, 5, 1000, 5, 1000]):
            assert R.string_to_counts(R.counts_to_string(c)) == list(c)

    def test_column_major(self):
        m = np.zeros((3, 2), np.uint8)
        m[0, 0] = 1  # first element in Fortran order
        cnts = R.mask_to_counts(m)
        assert cnts.tolist() == [0, 1, 5]

    def test_ann_to_rle_uncompressed(self):
        rle = R.ann_to_rle(dict(size=[4, 4], counts=[2, 3, 11]), 4, 4)
        m = R.decode(rle)
        assert m.reshape(-1, order="F").tolist() == \
            [0, 0, 1, 1, 1] + [0] * 11

    def test_mask_iou_crowd(self):
        a = np.zeros((10, 10), np.uint8); a[:5] = 1
        b = np.zeros((10, 10), np.uint8); b[:10] = 1  # superset crowd
        # crowd: intersection over DET area -> 1.0 even though IoU=0.5
        iou = R.iou([R.encode(a)], [R.encode(b)], [1])
        assert abs(iou[0, 0] - 1.0) < 1e-9
        iou2 = R.iou([R.encode(a)], [R.encode(b)], [0])
        assert abs(iou2[0, 0] - 0.5) < 1e-9


class TestSegmProtocol:
    def _perfect_case(self):
        """One gt mask, one det with the identical mask -> AP 1.0."""
        ev = CocoEvaluator([1], mode="segm")
        m = np.zeros((32, 32), np.uint8)
        m[8:20, 4:25] = 1
        seg = R.encode(m)
        ev.add_gt(0, [dict(bbox=[4, 8, 21, 12], category_id=1, iscrowd=0,
                           area=float(m.sum()),
                           segmentation=seg)], img_size=(32, 32))
        dets = [np.asarray([[4, 8, 24, 19, 0.9]], np.float64)]
        ev.add_det_per_class(0, dets, segms=[[seg]])
        return ev.evaluate()

    def test_perfect_det_scores_one(self):
        m = self._perfect_case()
        assert m["AP"] > 0.99
        assert m["AP50"] > 0.99

    def test_shifted_mask_misses_high_thresholds(self):
        ev = CocoEvaluator([1], mode="segm")
        gt = np.zeros((32, 32), np.uint8)
        gt[8:20, 4:24] = 1
        dt = np.zeros((32, 32), np.uint8)
        dt[8:20, 10:30] = 1  # IoU = 14/26 ~ 0.538 in cols overlap terms
        ev.add_gt(0, [dict(bbox=[4, 8, 20, 12], category_id=1, iscrowd=0,
                           area=float(gt.sum()),
                           segmentation=R.encode(gt))], img_size=(32, 32))
        ev.add_det_per_class(0, [np.asarray([[10, 8, 29, 19, 0.9]])],
                             segms=[[R.encode(dt)]])
        m = ev.evaluate()
        assert m["AP50"] > 0.99      # matches at 0.5
        assert m["AP75"] == 0.0      # not at 0.75
        # bbox mode on the same data says the same (bbox IoU ~0.54)
        ev2 = CocoEvaluator([1], mode="bbox")
        ev2.add_gt(0, [dict(bbox=[4, 8, 20, 12], category_id=1, iscrowd=0,
                            area=float(gt.sum()))])
        ev2.add_det_per_class(0, [np.asarray([[10, 8, 29, 19, 0.9]])])
        m2 = ev2.evaluate()
        assert m2["AP50"] > 0.99 and m2["AP75"] == 0.0

    def test_segm_differs_from_bbox_when_masks_do(self):
        """Same boxes, disjoint masks: bbox AP 1.0, segm AP 0."""
        gt = np.zeros((32, 32), np.uint8); gt[8:20, 4:14] = 1
        dt = np.zeros((32, 32), np.uint8); dt[8:20, 15:25] = 1
        ev = CocoEvaluator([1], mode="segm")
        ev.add_gt(0, [dict(bbox=[4, 8, 21, 12], category_id=1, iscrowd=0,
                           area=float(gt.sum()),
                           segmentation=R.encode(gt))], img_size=(32, 32))
        ev.add_det_per_class(0, [np.asarray([[4, 8, 24, 19, 0.9]])],
                             segms=[[R.encode(dt)]])
        assert ev.evaluate()["AP"] == 0.0


@pytest.fixture(scope="module")
def mask_coco(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("coco_mask")
    rng = np.random.default_rng(5)
    from PIL import Image
    images, annotations = [], []
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        w, h = 96, 64
        arr = rng.integers(0, 60, (h, w, 3), np.uint8)
        x, y, bw, bh = 20, 15, 30, 25
        arr[y:y + bh, x:x + bw] = [250, 40, 40]
        Image.fromarray(arr).save(img_dir / f"{i}.jpg")
        images.append(dict(id=i, file_name=f"{i}.jpg", width=w, height=h))
        poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
        annotations.append(dict(id=i, image_id=i, category_id=1,
                                bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0,
                                segmentation=[poly]))
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(dict(images=images, annotations=annotations,
                                   categories=[dict(id=1, name="thing")])))
    return str(ann), str(img_dir)


class TestMaskRCNNSegmScored:
    def test_mask_rcnn_scored_end_to_end(self, mask_coco, tmp_path):
        """Mask R-CNN inference -> paste -> RLE -> segm COCOeval produces
        finite metrics (random weights -> ~0 AP, but the full loop runs)."""
        import jax
        import jax.numpy as jnp
        from ioudet.apis.test import single_device_test
        from ioudet.data import build_dataset
        from ioudet.models import build_detector

        ann_file, img_dir = mask_coco
        cfg = dict(
            type="MaskRCNN",
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
            bbox_head=dict(type="SharedFCBBoxHead", num_classes=2,
                           in_channels=32, fc_out_channels=32),
            mask_roi_extractor=dict(type="SingleRoIExtractor",
                                    out_channels=32,
                                    featmap_strides=(4, 8, 16, 32),
                                    roi_layer=dict(out_size=14,
                                                   sample_num=2)),
            mask_head=dict(type="FCNMaskHead", num_convs=1, in_channels=32,
                           conv_out_channels=32, num_classes=2))
        test_cfg = dict(rpn=dict(nms_pre=64, max_num=16, nms_thr=0.7),
                        rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                                  max_per_img=8))
        det = build_detector(cfg, None, test_cfg)
        norm = dict(mean=(30., 30., 30.), std=(60., 60., 60.), to_rgb=False)
        pipe = [
            dict(type="LoadImageFromFile"),
            dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
            dict(type="Normalize", **norm),
            dict(type="Pad", size_divisor=32, size=(64, 96)),
            dict(type="Collect", keys=["img"]),
        ]
        dataset = build_dataset(dict(type="CocoDataset", ann_file=ann_file,
                                     img_prefix=img_dir, pipeline=pipe,
                                     test_mode=True))
        img0 = jnp.zeros((1, 64, 96, 3))
        shapes = jnp.asarray([[64, 96]], jnp.int32)
        variables = det.init(jax.random.PRNGKey(0), img0, shapes,
                             jnp.ones((1,), jnp.float32), shapes,
                             method=det.simple_test)
        results = single_device_test(det, variables["params"], dataset,
                                     imgs_per_batch=4, progress=False)
        assert len(results) == 4
        assert isinstance(results[0], tuple)  # (bbox, segm)
        metrics = dataset.evaluate(results, metric=["bbox", "segm"])
        assert "bbox_AP" in metrics and "segm_AP" in metrics
        assert np.isfinite(metrics["segm_AP"])
        # json round trip carries segmentation records
        recs = dataset.results2json(results)
        assert all("segmentation" in r for r in recs) or len(recs) == 0
