"""Golden-value tests for box math against independent torch/numpy
implementations of the reference formulas (mmdet v1 conventions)."""

import numpy as np
import pytest
import torch

from ioudet.core import bbox2delta, delta2bbox, bbox_overlaps, bbox_flip


def torch_bbox2delta(proposals, gt, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.)):
    px = (proposals[:, 0] + proposals[:, 2]) * 0.5
    py = (proposals[:, 1] + proposals[:, 3]) * 0.5
    pw = proposals[:, 2] - proposals[:, 0] + 1.0
    ph = proposals[:, 3] - proposals[:, 1] + 1.0
    gx = (gt[:, 0] + gt[:, 2]) * 0.5
    gy = (gt[:, 1] + gt[:, 3]) * 0.5
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    deltas = torch.stack(
        [(gx - px) / pw, (gy - py) / ph, torch.log(gw / pw), torch.log(gh / ph)], -1)
    means = torch.tensor(means)
    stds = torch.tensor(stds)
    return (deltas - means) / stds


def torch_delta2bbox(rois, deltas, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
                     max_shape=None, wh_ratio_clip=16 / 1000):
    means = torch.tensor(means).repeat(1, deltas.size(1) // 4)
    stds = torch.tensor(stds).repeat(1, deltas.size(1) // 4)
    denorm = deltas * stds + means
    dx, dy = denorm[:, 0::4], denorm[:, 1::4]
    dw, dh = denorm[:, 2::4], denorm[:, 3::4]
    max_ratio = abs(float(np.log(wh_ratio_clip)))
    dw = dw.clamp(-max_ratio, max_ratio)
    dh = dh.clamp(-max_ratio, max_ratio)
    px = ((rois[:, 0] + rois[:, 2]) * 0.5).unsqueeze(1).expand_as(dx)
    py = ((rois[:, 1] + rois[:, 3]) * 0.5).unsqueeze(1).expand_as(dy)
    pw = (rois[:, 2] - rois[:, 0] + 1.0).unsqueeze(1).expand_as(dw)
    ph = (rois[:, 3] - rois[:, 1] + 1.0).unsqueeze(1).expand_as(dh)
    gw = pw * dw.exp()
    gh = ph * dh.exp()
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5 + 0.5
    y1 = gy - gh * 0.5 + 0.5
    x2 = gx + gw * 0.5 - 0.5
    y2 = gy + gh * 0.5 - 0.5
    if max_shape is not None:
        x1 = x1.clamp(0, max_shape[1] - 1)
        y1 = y1.clamp(0, max_shape[0] - 1)
        x2 = x2.clamp(0, max_shape[1] - 1)
        y2 = y2.clamp(0, max_shape[0] - 1)
    return torch.stack([x1, y1, x2, y2], dim=-1).view_as(deltas)


def np_overlaps(b1, b2, mode="iou"):
    M, N = b1.shape[0], b2.shape[0]
    out = np.zeros((M, N), dtype=np.float64)
    a1 = (b1[:, 2] - b1[:, 0] + 1) * (b1[:, 3] - b1[:, 1] + 1)
    a2 = (b2[:, 2] - b2[:, 0] + 1) * (b2[:, 3] - b2[:, 1] + 1)
    for i in range(M):
        for j in range(N):
            iw = min(b1[i, 2], b2[j, 2]) - max(b1[i, 0], b2[j, 0]) + 1
            ih = min(b1[i, 3], b2[j, 3]) - max(b1[i, 1], b2[j, 1]) + 1
            inter = max(iw, 0) * max(ih, 0)
            denom = a1[i] + a2[j] - inter if mode == "iou" else a1[i]
            out[i, j] = inter / max(denom, 1e-10)
    return out


def random_boxes(n, seed, hi=200.0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, hi, (n, 2))
    wh = rng.uniform(1, 100, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestBoxTransforms:
    def test_bbox2delta_matches_reference_formula(self):
        props = random_boxes(64, 0)
        gts = random_boxes(64, 1)
        for means, stds in [((0, 0, 0, 0), (1, 1, 1, 1)),
                            ((0, 0, 0, 0), (0.1, 0.1, 0.2, 0.2))]:
            ours = np.asarray(bbox2delta(props, gts, means, stds))
            golden = torch_bbox2delta(torch.from_numpy(props),
                                      torch.from_numpy(gts), means, stds).numpy()
            np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)

    def test_delta2bbox_matches_reference_formula(self):
        rois = random_boxes(64, 2)
        rng = np.random.default_rng(3)
        deltas = rng.normal(0, 2, (64, 4)).astype(np.float32)  # exercise clamp
        for max_shape in [None, (600, 800)]:
            ours = np.asarray(delta2bbox(rois, deltas, max_shape=max_shape))
            golden = torch_delta2bbox(torch.from_numpy(rois),
                                      torch.from_numpy(deltas),
                                      max_shape=max_shape).numpy()
            np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-3)

    def test_roundtrip(self):
        props = random_boxes(32, 4)
        gts = random_boxes(32, 5)
        deltas = bbox2delta(props, gts)
        rec = np.asarray(delta2bbox(props, np.asarray(deltas)))
        np.testing.assert_allclose(rec, gts, rtol=1e-4, atol=1e-2)

    def test_multi_class_deltas(self):
        rois = random_boxes(16, 6)
        rng = np.random.default_rng(7)
        deltas = rng.normal(0, 1, (16, 12)).astype(np.float32)  # 3 classes
        ours = np.asarray(delta2bbox(rois, deltas))
        golden = torch_delta2bbox(torch.from_numpy(rois),
                                  torch.from_numpy(deltas)).numpy()
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-3)

    def test_flip_involution(self):
        b = random_boxes(16, 8)
        shape = (600, 800)
        flipped = np.asarray(bbox_flip(b, shape))
        back = np.asarray(bbox_flip(flipped, shape))
        np.testing.assert_allclose(back, b, atol=1e-3)  # fp32 round trip
        # x2' = W - x1 - 1
        np.testing.assert_allclose(flipped[:, 2], shape[1] - b[:, 0] - 1,
                                   atol=1e-3)


class TestOverlaps:
    def test_pairwise_iou(self):
        b1, b2 = random_boxes(20, 10), random_boxes(30, 11)
        ours = np.asarray(bbox_overlaps(b1, b2))
        np.testing.assert_allclose(ours, np_overlaps(b1, b2), rtol=1e-5, atol=1e-6)

    def test_iof(self):
        b1, b2 = random_boxes(10, 12), random_boxes(15, 13)
        ours = np.asarray(bbox_overlaps(b1, b2, mode="iof"))
        np.testing.assert_allclose(ours, np_overlaps(b1, b2, "iof"),
                                   rtol=1e-5, atol=1e-6)

    def test_aligned(self):
        b1, b2 = random_boxes(25, 14), random_boxes(25, 15)
        ours = np.asarray(bbox_overlaps(b1, b2, is_aligned=True))
        full = np_overlaps(b1, b2)
        np.testing.assert_allclose(ours, np.diag(full), rtol=1e-5, atol=1e-6)

    def test_identical_boxes_iou_one(self):
        b = random_boxes(8, 16)
        ours = np.asarray(bbox_overlaps(b, b, is_aligned=True))
        np.testing.assert_allclose(ours, np.ones(8), rtol=1e-6)
