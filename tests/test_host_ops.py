"""Native host ops vs numpy fallbacks and vs the device NMS kernels — the
parity axis the reference tested as CUDA-vs-CPU (ref: tests/test_nms.py)."""

import numpy as np
import pytest

from ioudet.ops.host_ops import (native_available, nms_host, soft_nms_host,
                                 bbox_overlaps_host, coco_match_host,
                                 build_native)
from ioudet.core.evaluation.bbox_overlaps import bbox_overlaps_np


def random_dets(n, seed, spread=120.0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, spread, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    return (np.concatenate([xy, xy + wh], 1).astype(np.float32),
            rng.uniform(0.01, 1.0, n).astype(np.float32))


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib not built")


class TestNativeNMS:
    def test_matches_device_nms(self):
        from ioudet.ops import nms as device_nms
        for seed in range(4):
            boxes, scores = random_dets(64, seed)
            host_keep = set(nms_host(boxes, scores, 0.5).tolist())
            _, keep, order = device_nms(boxes, scores, 0.5)
            dev_keep = set(np.asarray(order)[np.asarray(keep)].tolist())
            assert host_keep == dev_keep

    def test_soft_nms_matches_device(self):
        from ioudet.ops import soft_nms as device_soft
        boxes, scores = random_dets(32, 7)
        sel, sc = soft_nms_host(boxes, scores, iou_thr=0.3, method="gaussian",
                                sigma=0.5, min_score=1e-3)
        dets, keep, order = device_soft(boxes, scores, iou_thr=0.3,
                                        method="gaussian", sigma=0.5,
                                        min_score=1e-3)
        dev_order = np.asarray(order)[np.asarray(keep)]
        np.testing.assert_array_equal(sel, dev_order)
        dev_scores = np.asarray(dets)[np.asarray(keep), 4]
        np.testing.assert_allclose(sc, dev_scores, rtol=1e-4, atol=1e-5)

    def test_overlaps_matches_numpy(self):
        b1, _ = random_dets(20, 1)
        b2, _ = random_dets(30, 2)
        native = bbox_overlaps_host(b1, b2)
        ref = bbox_overlaps_np(b1, b2)
        np.testing.assert_allclose(native, ref, rtol=1e-5, atol=1e-6)


class TestNativeCocoMatch:
    def test_matches_python_loop(self):
        """Force-compare native matching against the pure-python matcher by
        rebuilding the same scenario through the public evaluator."""
        from ioudet.core.evaluation.coco_eval import CocoEvaluator
        rng = np.random.default_rng(3)
        ev = CocoEvaluator(cat_ids=[1, 2])
        for img in range(4):
            gts = []
            for _ in range(5):
                x, y = rng.uniform(0, 200, 2)
                w, h = rng.uniform(10, 80, 2)
                gts.append(dict(bbox=[float(x), float(y), float(w), float(h)],
                                category_id=int(rng.integers(1, 3)),
                                iscrowd=int(rng.uniform() < 0.2)))
            ev.add_gt(img, gts)
            dets = []
            for c in (1, 2):
                k = rng.integers(1, 6)
                xy = rng.uniform(0, 220, (k, 2))
                wh = rng.uniform(10, 80, (k, 2))
                arr = np.concatenate(
                    [xy, xy + wh, rng.uniform(0.1, 1, (k, 1))], 1)
                dets.append(arr.astype(np.float32))
            ev.add_det_per_class(img, dets)
        native_metrics = ev.evaluate()

        import ioudet.core.evaluation.coco_eval as ce
        import ioudet.ops.host_ops as ho
        orig = ho.coco_match_host
        ho.coco_match_host = lambda *a, **k: (None, None)  # force python path
        try:
            py_metrics = ev.evaluate()
        finally:
            ho.coco_match_host = orig
        for k in native_metrics:
            np.testing.assert_allclose(native_metrics[k], py_metrics[k],
                                       atol=1e-9, err_msg=k)


class TestNativeRleIoU:
    """csrc rle_iou_matrix (run-walk, no pixel decode) vs the numpy
    decode-based oracle."""

    def test_matches_decode_oracle(self):
        import numpy as np
        from ioudet.core.mask import rle
        from ioudet.ops.host_ops import rle_iou_host, native_available
        if not native_available():
            import pytest
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(0)
        H = W = 40
        def rand_rle():
            m = (rng.uniform(size=(H, W)) <
                 rng.uniform(0.1, 0.6)).astype(np.uint8)
            return rle.encode(m)
        dts = [rand_rle() for _ in range(5)]
        gts = [rand_rle() for _ in range(4)]
        crowd = np.asarray([0, 1, 0, 1], np.uint8)
        native = rle_iou_host([rle._counts_of(r) for r in dts],
                              [rle._counts_of(r) for r in gts], crowd)
        # decode-based oracle
        dm = [rle.decode(r).astype(bool) for r in dts]
        gm = [rle.decode(r).astype(bool) for r in gts]
        want = np.zeros((5, 4))
        for i in range(5):
            for j in range(4):
                inter = (dm[i] & gm[j]).sum()
                denom = dm[i].sum() if crowd[j] else \
                    dm[i].sum() + gm[j].sum() - inter
                want[i, j] = inter / max(denom, 1e-10)
        np.testing.assert_allclose(native, want, rtol=1e-12)

    def test_empty_masks(self):
        import numpy as np
        from ioudet.core.mask import rle
        from ioudet.ops.host_ops import rle_iou_host, native_available
        if not native_available():
            import pytest
            pytest.skip("native lib unavailable")
        empty = rle.encode(np.zeros((8, 8), np.uint8))
        full = rle.encode(np.ones((8, 8), np.uint8))
        out = rle_iou_host([rle._counts_of(empty)], [rle._counts_of(full)],
                           np.asarray([0], np.uint8))
        assert out.shape == (1, 1) and out[0, 0] == 0.0
