"""Exact hand-derived goldens for the from-scratch COCO evaluator.

VERDICT round-1 weak #7: the evaluator was only self-validated (protocol
tests written from the same understanding).  pycocotools is absent in this
environment, so these cases are constructed small enough that the official
algorithm's output is derivable BY HAND from its spec (greedy score-ordered
matching, best-IoU assignment, 101-point interpolated AP over recall grid
0:0.01:1, IoU thresholds 0.5:0.05:0.95) and asserted EXACTLY — any
transposed convention in the evaluator breaks an equality, not a tolerance.

Ref: pycocotools cocoeval.COCOeval semantics per SURVEY.md §2.1 + §7
hard-part #5.
"""

import numpy as np

from ioudet.core.evaluation import CocoEvaluator


def _dets(*rows):
    return [np.asarray(rows, np.float32)]


def test_two_tp_one_fp_exact_101pt():
    """dets by score: TP(0.9), FP(0.8), TP(0.7) over 2 gts.
    P-R curve: (R=.5, P=1), (R=.5, P=.5), (R=1, P=2/3).
    Interpolated precision: 1.0 for r<=0.5 (51 grid points), 2/3 above
    (50 points)  =>  AP = (51 + 50*(2/3)) / 101."""
    ev = CocoEvaluator(cat_ids=[1])
    ev.add_gt(0, [dict(bbox=[0, 0, 10, 10], category_id=1, iscrowd=0),
                  dict(bbox=[50, 50, 10, 10], category_id=1, iscrowd=0)])
    ev.add_det_per_class(0, _dets(
        [0, 0, 9, 9, 0.9],          # IoU 1.0 with gt1 -> TP
        [200, 200, 209, 209, 0.8],  # FP
        [50, 50, 59, 59, 0.7]))     # IoU 1.0 with gt2 -> TP
    m = ev.evaluate()
    expect = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    assert abs(m["AP50"] - expect) < 1e-9
    assert abs(m["AP"] - expect) < 1e-9          # same at every IoU thr
    assert m["AR100"] == 1.0


def test_iou_sweep_exact():
    """Single det at IoU exactly 0.6 with the gt: counts at thresholds
    {.5,.55,.6}, misses the other 7  =>  AP = 3/10, AP50 = 1, AP75 = 0."""
    ev = CocoEvaluator(cat_ids=[1])
    ev.add_gt(0, [dict(bbox=[10, 10, 20, 20], category_id=1, iscrowd=0)])
    # xywh [15,10,20,20]: inter 15*20=300, union 800-300=500 -> IoU 0.6
    ev.add_det_per_class(0, _dets([15, 10, 34, 29, 0.9]))
    m = ev.evaluate()
    assert m["AP50"] == 1.0
    assert m["AP75"] == 0.0
    assert abs(m["AP"] - 0.3) < 1e-9


def test_maxdets_1_vs_100():
    """Two perfect dets on two gts: AR1 truncates to the top-scored det
    (recall 0.5); AR100 sees both (recall 1.0)."""
    ev = CocoEvaluator(cat_ids=[1])
    ev.add_gt(0, [dict(bbox=[0, 0, 10, 10], category_id=1, iscrowd=0),
                  dict(bbox=[50, 50, 10, 10], category_id=1, iscrowd=0)])
    ev.add_det_per_class(0, _dets([0, 0, 9, 9, 0.9],
                                  [50, 50, 59, 59, 0.8]))
    m = ev.evaluate()
    assert m["AR1"] == 0.5
    assert m["AR100"] == 1.0
    assert m["AP"] == 1.0


def test_cross_image_score_ranking():
    """Ranking is GLOBAL across images: a high-scored FP in image 2
    precedes image 1's TP.  Curve: (R=0, P=0) then (R=1, P=0.5)
    => interpolated precision 0.5 at every recall point => AP = 0.5."""
    ev = CocoEvaluator(cat_ids=[1])
    ev.add_gt(0, [dict(bbox=[0, 0, 10, 10], category_id=1, iscrowd=0)])
    ev.add_gt(1, [])
    ev.add_det_per_class(0, _dets([0, 0, 9, 9, 0.6]))       # TP, low score
    ev.add_det_per_class(1, _dets([0, 0, 9, 9, 0.9]))       # FP, high score
    m = ev.evaluate()
    assert abs(m["AP50"] - 0.5) < 1e-9


def test_area_ranges_use_annotation_area():
    """gt ignore per area range comes from ann['area'] (segmentation area),
    NOT bbox w*h: a gt with bbox 40x40 but ann area 900 is SMALL."""
    ev = CocoEvaluator(cat_ids=[1])
    ev.add_gt(0, [dict(bbox=[0, 0, 40, 40], category_id=1, iscrowd=0,
                       area=900.0)])
    ev.add_det_per_class(0, _dets([0, 0, 39, 39, 0.9]))
    m = ev.evaluate()
    assert m["AP"] == 1.0
    assert m["APs"] == 1.0       # counted in the small range
    assert m["APl"] == -1.0      # no large gts -> undefined (-1)


def test_greedy_matching_prefers_best_iou():
    """A det overlapping two gts matches the HIGHER-IoU one; the second det
    then takes the remaining gt (both TP)."""
    ev = CocoEvaluator(cat_ids=[1])
    ev.add_gt(0, [dict(bbox=[0, 0, 10, 10], category_id=1, iscrowd=0),
                  dict(bbox=[6, 0, 10, 10], category_id=1, iscrowd=0)])
    # det1 IoU: with gt1 = 1.0, with gt2 = 4/16... takes gt1
    ev.add_det_per_class(0, _dets([0, 0, 9, 9, 0.9],
                                  [6, 0, 15, 9, 0.8]))
    m = ev.evaluate()
    assert m["AP50"] == 1.0 and m["AR100"] == 1.0


def test_duplicate_det_is_fp():
    """Second det on an already-matched gt is a FP (no double counting):
    curve (R=1, P=1) then (R=1, P=.5) -> interp precision 1.0 everywhere."""
    ev = CocoEvaluator(cat_ids=[1])
    ev.add_gt(0, [dict(bbox=[0, 0, 10, 10], category_id=1, iscrowd=0)])
    ev.add_det_per_class(0, _dets([0, 0, 9, 9, 0.9],
                                  [0, 0, 9, 9, 0.8]))
    m = ev.evaluate()
    assert m["AP50"] == 1.0
