"""COCO/VOC evaluation correctness on hand-constructed scenarios with known
AP values."""

import numpy as np

from ioudet.core.evaluation import (CocoEvaluator, eval_map, eval_recalls,
                                    average_precision)


def det(x1, y1, x2, y2, s):
    return np.array([[x1, y1, x2, y2, s]], np.float32)


class TestCocoEval:
    def test_perfect_detection(self):
        ev = CocoEvaluator(cat_ids=[1])
        ev.add_gt(0, [dict(bbox=[10, 10, 20, 20], category_id=1, iscrowd=0)])
        # detection xyxy that converts to the same xywh (+1 convention)
        ev.add_det_per_class(0, [det(10, 10, 29, 29, 0.9)])
        m = ev.evaluate()
        assert m["AP"] == 1.0 and m["AP50"] == 1.0 and m["AR100"] == 1.0

    def test_complete_miss(self):
        ev = CocoEvaluator(cat_ids=[1])
        ev.add_gt(0, [dict(bbox=[10, 10, 20, 20], category_id=1, iscrowd=0)])
        ev.add_det_per_class(0, [det(200, 200, 240, 240, 0.9)])
        m = ev.evaluate()
        assert m["AP"] == 0.0 and m["AR100"] == 0.0

    def test_half_precision(self):
        """One TP + one higher-scored FP -> precision at recall 1 is 0.5,
        AP(101pt) = mean over recall points of interpolated precision."""
        ev = CocoEvaluator(cat_ids=[1])
        ev.add_gt(0, [dict(bbox=[10, 10, 20, 20], category_id=1, iscrowd=0)])
        ev.add_det_per_class(0, [np.array(
            [[200, 200, 240, 240, 0.95], [10, 10, 29, 29, 0.9]], np.float32)])
        m = ev.evaluate()
        assert abs(m["AP50"] - 0.5) < 0.02
        assert m["AR100"] == 1.0

    def test_crowd_gt_not_fp(self):
        """A det matching only a crowd gt must not count as FP, and the crowd
        must not count as a gt for recall."""
        ev = CocoEvaluator(cat_ids=[1])
        ev.add_gt(0, [dict(bbox=[10, 10, 20, 20], category_id=1, iscrowd=1),
                      dict(bbox=[100, 100, 20, 20], category_id=1, iscrowd=0)])
        ev.add_det_per_class(0, [np.array(
            [[10, 10, 29, 29, 0.8],        # on the crowd -> ignored
             [100, 100, 119, 119, 0.9]],   # on the real gt -> TP
            np.float32)])
        m = ev.evaluate()
        assert m["AP"] == 1.0

    def test_area_ranges(self):
        ev = CocoEvaluator(cat_ids=[1])
        # one small gt (16x16) and one large gt (200x200)
        ev.add_gt(0, [dict(bbox=[0, 0, 16, 16], category_id=1, iscrowd=0),
                      dict(bbox=[300, 300, 200, 200], category_id=1, iscrowd=0)])
        # detect only the large one
        ev.add_det_per_class(0, [det(300, 300, 499, 499, 0.9)])
        m = ev.evaluate()
        assert m["APl"] == 1.0
        assert m["APs"] == 0.0
        assert abs(m["AP50"] - 0.5) < 0.02

    def test_duplicate_detection_is_fp(self):
        ev = CocoEvaluator(cat_ids=[1])
        ev.add_gt(0, [dict(bbox=[10, 10, 20, 20], category_id=1, iscrowd=0)])
        ev.add_det_per_class(0, [np.array(
            [[10, 10, 29, 29, 0.9], [11, 11, 30, 30, 0.8]], np.float32)])
        m = ev.evaluate()
        # second det is a duplicate -> FP at recall 1; AP50 stays 1.0 because
        # precision envelope at all recall points up to 1.0 is 1.0
        assert m["AP50"] == 1.0

    def test_maxdets_limits(self):
        ev = CocoEvaluator(cat_ids=[1])
        gts = [dict(bbox=[i * 50, 0, 20, 20], category_id=1, iscrowd=0)
               for i in range(5)]
        ev.add_gt(0, gts)
        dets = np.array([[i * 50, 0, i * 50 + 19, 19, 0.9 - i * 0.1]
                         for i in range(5)], np.float32)
        ev.add_det_per_class(0, [dets])
        m = ev.evaluate()
        assert abs(m["AR1"] - 0.2) < 1e-6
        assert m["AR100"] == 1.0


class TestVocMap:
    def test_perfect(self):
        dets = [[det(10, 10, 20, 20, 0.9)]]
        gts = [np.array([[10, 10, 20, 20]], np.float32)]
        labels = [np.array([1])]
        mAP, _ = eval_map(dets, gts, labels, num_classes=1)
        assert mAP == 1.0

    def test_eleven_point_mode(self):
        rec = np.array([0.5])
        prec = np.array([1.0])
        ap11 = average_precision(rec, prec, "11points")
        # precision 1.0 available at recall thresholds 0..0.5 -> 6/11
        assert abs(ap11 - 6 / 11) < 1e-6

    def test_two_class(self):
        dets = [[det(10, 10, 20, 20, 0.9), det(50, 50, 60, 60, 0.8)]]
        gts = [np.array([[10, 10, 20, 20], [50, 50, 60, 60]], np.float32)]
        labels = [np.array([1, 2])]
        mAP, per_cls = eval_map(dets, gts, labels, num_classes=2)
        assert mAP == 1.0
        assert per_cls[0]["num_gts"] == 1 and per_cls[1]["num_gts"] == 1


class TestRecalls:
    def test_proposals_cover_gts(self):
        gts = [np.array([[0, 0, 10, 10]], np.float32)]
        props = [np.array([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.8]],
                          np.float32)]
        r = eval_recalls(gts, props, proposal_nums=[1, 2], iou_thrs=[0.5])
        assert r[0, 0] == 1.0 and r[1, 0] == 1.0
