"""NMS kernels vs independent numpy greedy/soft oracles (the reference tests
CUDA vs CPU parity; we test jitted-fixed-shape vs numpy oracle)."""

import numpy as np

from ioudet.core import multiclass_nms
from ioudet.ops import nms, soft_nms, matrix_nms


def np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i or scores[j] > scores[i]:
                continue
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]) + 1
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]) + 1
            inter = max(iw, 0) * max(ih, 0)
            a_i = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
            a_j = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
            if inter / (a_i + a_j - inter) > thr:
                suppressed[j] = True
    return np.array(keep)


def random_dets(n, seed, spread=120.0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, spread, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


class TestGreedyNMS:
    def test_fixed_point_equals_sequential(self):
        """The while_loop fixed-point formulation must match the N-step
        sequential oracle exactly, including suppression chains."""
        import jax.numpy as jnp
        from ioudet.core.bbox.geometry import bbox_overlaps
        from ioudet.ops.nms import greedy_suppress, greedy_suppress_sequential
        for seed in range(8):
            boxes, scores = random_dets(128, seed, spread=60.0)  # dense overlaps
            order = np.argsort(-scores)
            b = boxes[order]
            iou = bbox_overlaps(jnp.asarray(b), jnp.asarray(b))
            valid = jnp.ones(128, bool)
            fp = np.asarray(greedy_suppress(iou, valid, 0.4))
            seq = np.asarray(greedy_suppress_sequential(iou, valid, 0.4))
            np.testing.assert_array_equal(fp, seq)

    def test_chain_suppression(self):
        """A suppresses B, B would suppress C: greedy keeps A and C."""
        boxes = np.array([[0, 0, 10, 10], [0, 4, 10, 14], [0, 8, 10, 18]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        _, keep, order = nms(boxes, scores, 0.3)
        kept = sorted(np.asarray(order)[np.asarray(keep)].tolist())
        assert kept == [0, 2]

    def test_vs_numpy_oracle(self):
        for seed in range(5):
            boxes, scores = random_dets(64, seed)
            dets, keep, order = nms(boxes, scores, 0.5)
            kept_idx = np.sort(np.asarray(order)[np.asarray(keep)])
            oracle = np.sort(np_greedy_nms(boxes, scores, 0.5))
            np.testing.assert_array_equal(kept_idx, oracle)

    def test_identical_boxes_keep_one(self):
        boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (5, 1))
        scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
        _, keep, order = nms(boxes, scores, 0.5)
        assert np.asarray(keep).sum() == 1
        assert np.asarray(order)[np.asarray(keep)][0] == 0

    def test_valid_mask(self):
        boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
        scores = np.array([0.9, 0.95], np.float32)
        _, keep, order = nms(boxes, scores, 0.5,
                             valid=np.array([True, False]))
        kept = np.asarray(order)[np.asarray(keep)]
        assert list(kept) == [0]

    def test_disjoint_all_kept(self):
        boxes = np.array([[i * 100, 0, i * 100 + 10, 10] for i in range(8)],
                         np.float32)
        scores = np.linspace(0.1, 0.9, 8).astype(np.float32)
        _, keep, _ = nms(boxes, scores, 0.5)
        assert np.asarray(keep).sum() == 8


class TestSoftNMS:
    def test_decays_overlapping(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        dets, keep, order = soft_nms(boxes, scores, iou_thr=0.3,
                                     method="gaussian", sigma=0.5)
        dets, order = np.asarray(dets), np.asarray(order)
        # first selected is the top box, score unchanged
        assert order[0] == 0 and abs(dets[0, 4] - 0.9) < 1e-6
        # the overlapping second box must be selected later with decayed score
        pos1 = list(order).index(1)
        assert dets[pos1, 4] < 0.8
        # disjoint box keeps its score
        pos2 = list(order).index(2)
        assert abs(dets[pos2, 4] - 0.7) < 1e-5

    def test_linear_matches_manual(self):
        boxes = np.array([[0, 0, 9, 9], [0, 5, 9, 14]], np.float32)
        scores = np.array([0.9, 0.6], np.float32)
        # IoU = 50/150 = 1/3 > 0.3 -> decayed by (1 - 1/3)
        dets, keep, order = soft_nms(boxes, scores, iou_thr=0.3, method="linear")
        pos1 = list(np.asarray(order)).index(1)
        np.testing.assert_allclose(np.asarray(dets)[pos1, 4], 0.6 * (1 - 1 / 3),
                                   rtol=1e-5)

    def test_min_score_drops(self):
        boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (3, 1))
        scores = np.array([0.9, 0.5, 0.4], np.float32)
        dets, keep, order = soft_nms(boxes, scores, iou_thr=0.3,
                                     method="linear", min_score=0.1)
        # identical boxes: IoU=1 -> linear decay factor 0 -> others drop below
        assert np.asarray(keep).sum() == 1


class TestMatrixNMS:
    def test_decay_properties(self):
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        out = np.asarray(matrix_nms(boxes, scores, sigma=0.5))
        assert abs(out[0] - 0.9) < 1e-6      # top box untouched
        assert out[1] < 0.15                 # duplicate heavily decayed (exp(-2)*0.8)
        assert abs(out[2] - 0.7) < 1e-5      # disjoint untouched


class TestMulticlassNMS:
    def np_multiclass(self, boxes, scores, score_thr, iou_thr, max_num):
        results = []
        for c in range(scores.shape[1]):
            mask = scores[:, c] > score_thr
            if not mask.any():
                continue
            b, s = boxes[mask], scores[mask, c]
            keep = np_greedy_nms(b, s, iou_thr)
            for i in keep:
                results.append((s[i], tuple(b[i]), c))
        results.sort(key=lambda t: -t[0])
        return results[:max_num]

    def test_vs_per_class_oracle(self):
        rng = np.random.default_rng(42)
        boxes, _ = random_dets(40, 3)
        scores = rng.uniform(0, 1, (40, 5)).astype(np.float32) ** 2
        dets, labels = multiclass_nms(boxes, scores, score_thr=0.2,
                                      iou_thr=0.5, max_per_img=20)
        dets, labels = np.asarray(dets), np.asarray(labels)
        got = [(round(float(d[4]), 4), int(l))
               for d, l in zip(dets, labels) if l >= 0]
        oracle = [(round(float(s), 4), int(c))
                  for s, _, c in self.np_multiclass(boxes, scores, 0.2, 0.5, 20)]
        assert got == oracle

    def test_fixed_output_shape(self):
        boxes, _ = random_dets(10, 5)
        scores = np.full((10, 3), 0.01, np.float32)  # everything below thr
        dets, labels = multiclass_nms(boxes, scores, score_thr=0.05)
        assert dets.shape == (100, 5) and labels.shape == (100,)
        assert (np.asarray(labels) == -1).all()
        assert (np.asarray(dets) == 0).all()

    def test_soft_nms_mode(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         np.float32)
        scores = np.array([[0.9], [0.8], [0.7]], np.float32)
        dets, labels = multiclass_nms(boxes, scores, score_thr=0.05,
                                      max_per_img=10, nms_type="soft_nms")
        dets = np.asarray(dets)
        kept = dets[np.asarray(labels) >= 0]
        assert len(kept) == 3  # soft nms keeps all, decays the overlap
        assert abs(kept[0, 4] - 0.9) < 1e-5
        assert kept[1, 4] < 0.8  # decayed

    def test_score_factors(self):
        boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
        scores = np.array([[0.8], [0.8]], np.float32)
        factors = np.array([1.0, 0.5], np.float32)
        dets, labels = multiclass_nms(boxes, scores, 0.05,
                                      score_factors=factors, max_per_img=10)
        dets = np.asarray(dets)
        np.testing.assert_allclose(dets[0, 4], 0.8, rtol=1e-5)
        np.testing.assert_allclose(dets[1, 4], 0.4, rtol=1e-5)
