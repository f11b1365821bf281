"""RepPoints head: points2bbox goldens vs an independent torch derivation,
PointAssigner vs a numpy oracle of the reference loop, and end-to-end
train/test through the detector (ref: mmdet/models/anchor_heads/
reppoints_head.py, mmdet/core/bbox/assigners/point_assigner.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ioudet.core.bbox import PointAssigner
from ioudet.models import build_detector
from ioudet.models.heads.reppoints_head import (RepPointsHead,
                                                level_point_centers,
                                                points2bbox)


# --------------------------------------------------------------- points2bbox

def torch_points2bbox(pts_xy: torch.Tensor, method: str,
                      moment_transfer: torch.Tensor,
                      moment_mul: float = 0.01) -> torch.Tensor:
    """Independent torch twin of the reference transform on (N, P, 2) (x, y)
    point sets."""
    px, py = pts_xy[..., 0], pts_xy[..., 1]
    if method == "minmax":
        return torch.stack([px.min(-1).values, py.min(-1).values,
                            px.max(-1).values, py.max(-1).values], -1)
    if method == "partial_minmax":
        px, py = px[..., :4], py[..., :4]
        return torch.stack([px.min(-1).values, py.min(-1).values,
                            px.max(-1).values, py.max(-1).values], -1)
    mx, my = px.mean(-1), py.mean(-1)
    sx = torch.std(px - mx[..., None], dim=-1)
    sy = torch.std(py - my[..., None], dim=-1)
    mt = moment_transfer * moment_mul + moment_transfer.detach() \
        * (1 - moment_mul)
    hw, hh = sx * torch.exp(mt[0]), sy * torch.exp(mt[1])
    return torch.stack([mx - hw, my - hh, mx + hw, my + hh], -1)


@pytest.mark.parametrize("method", ["minmax", "partial_minmax", "moment"])
def test_points2bbox_matches_torch(method):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 20, (7, 9, 2)).astype(np.float32)
    mt = np.asarray([0.3, -0.2], np.float32)
    ours = np.asarray(points2bbox(jnp.asarray(pts), jnp.asarray(mt), method))
    ref = torch_points2bbox(torch.from_numpy(pts), method,
                            torch.from_numpy(mt)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_points2bbox_moment_gradient_scaled_by_moment_mul():
    pts = jnp.asarray(np.random.default_rng(1).normal(0, 5, (3, 9, 2)),
                      jnp.float32)

    def f(mt):
        return jnp.sum(points2bbox(pts, mt, "moment", moment_mul=0.01))

    g = jax.grad(f)(jnp.asarray([0.0, 0.0]))
    g_full = jax.grad(lambda mt: jnp.sum(
        points2bbox(pts, mt, "moment", moment_mul=1.0)))(
            jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(g), 0.01 * np.asarray(g_full),
                               rtol=1e-5)


# ------------------------------------------------------------- PointAssigner

def oracle_point_assign(points, gts, labels, scale, pos_num):
    """Literal numpy transcription of the reference's sequential loop."""
    P = len(points)
    lvl = np.floor(np.log2(points[:, 2])).astype(int)
    lmin, lmax = lvl.min(), lvl.max()
    assigned = np.zeros(P, int)
    best = np.full(P, np.inf)
    out_labels = np.zeros(P, int)
    for i, gt in enumerate(gts):
        cx, cy = (gt[0] + gt[2]) / 2, (gt[1] + gt[3]) / 2
        w = max(gt[2] - gt[0], 1e-6)
        h = max(gt[3] - gt[1], 1e-6)
        glvl = int(0.5 * (np.log2(w / scale) + np.log2(h / scale)))
        glvl = min(max(glvl, lmin), lmax)
        idx = np.nonzero(lvl == glvl)[0]
        d = np.linalg.norm((points[idx, :2] - [cx, cy]) / [w, h], axis=1)
        order = np.argsort(d)[:pos_num]
        for o in order:
            p = idx[o]
            if d[o] < best[p]:
                assigned[p] = i + 1
                best[p] = d[o]
                out_labels[p] = labels[i]
    return assigned, out_labels


def test_point_assigner_matches_reference_loop():
    rng = np.random.default_rng(3)
    centers = np.concatenate([
        level_point_centers((8, 12), 8),
        level_point_centers((4, 6), 16),
        level_point_centers((2, 3), 32)]).astype(np.float32)
    G = 5
    xy = rng.uniform(0, 60, (G, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, (G, 2)).astype(np.float32)
    gts = np.concatenate([xy, xy + wh], -1)
    labels = rng.integers(1, 4, G)

    exp_inds, exp_labels = oracle_point_assign(centers, gts, labels,
                                               scale=4, pos_num=2)
    res = PointAssigner(scale=4, pos_num=2).assign(
        jnp.asarray(centers), jnp.asarray(gts),
        jnp.ones(G, bool), jnp.ones(len(centers), bool),
        gt_labels=jnp.asarray(labels, jnp.int32))
    np.testing.assert_array_equal(np.asarray(res.gt_inds), exp_inds)
    np.testing.assert_array_equal(np.asarray(res.labels), exp_labels)


def test_point_assigner_ignores_padded_gts():
    centers = level_point_centers((8, 8), 8).astype(np.float32)
    gts = np.asarray([[0, 0, 30, 30], [5, 5, 40, 40]], np.float32)
    res = PointAssigner(scale=4, pos_num=1).assign(
        jnp.asarray(centers), jnp.asarray(gts),
        jnp.asarray([True, False]), jnp.ones(len(centers), bool),
        gt_labels=jnp.asarray([2, 3], jnp.int32))
    inds = np.asarray(res.gt_inds)
    assert (inds == 2).sum() == 0 and (inds == 1).sum() == 1


# ------------------------------------------------------------- end to end

CFG = dict(
    type="RepPointsDetector",
    backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                  norm_cfg=dict(type="FrozenBN")),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=1, add_extra_convs=True, num_outs=5),
    bbox_head=dict(type="RepPointsHead", num_classes=4, in_channels=32,
                   feat_channels=32, point_feat_channels=32, stacked_convs=1,
                   point_strides=(8, 16, 32, 64, 128)))
TRAIN_CFG = dict(
    init=dict(assigner=dict(type="PointAssigner", scale=4, pos_num=1)),
    refine=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                              neg_iou_thr=0.4, min_pos_iou=0,
                              ignore_iof_thr=-1)))
TEST_CFG = dict(nms_pre=50, score_thr=0.01, nms=dict(iou_thr=0.5),
                max_per_img=10)


class TestRepPointsEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self):
        det = build_detector(dict(CFG), dict(TRAIN_CFG), dict(TEST_CFG))
        rng = np.random.default_rng(0)
        B, G = 2, 3
        img = jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)), jnp.float32)
        xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
        batch = dict(
            img=img,
            gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
            gt_labels=jnp.asarray(rng.integers(1, 4, (B, G)), jnp.int32),
            gt_valid=jnp.ones((B, G), bool),
            img_shape=jnp.tile(jnp.asarray([[64, 96]], jnp.int32), (B, 1)))
        variables = det.init(jax.random.PRNGKey(0), img)
        return det, variables, batch

    def test_forward_shapes(self, setup):
        det, variables, batch = setup
        cls, p_init, p_ref, moment = det.apply(variables, batch["img"])
        assert len(cls) == 5 and len(p_init) == 5 and len(p_ref) == 5
        assert cls[0].shape == (2, 8, 12, 3)
        assert p_init[0].shape == (2, 8, 12, 18)
        assert p_ref[0].shape == (2, 8, 12, 18)
        assert moment.shape == (2,)

    def test_losses_finite_and_grads_flow(self, setup):
        det, variables, batch = setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], method=det.forward_train))(
                variables, batch)
        assert set(losses) == {"loss_cls", "loss_pts_init",
                               "loss_pts_refine"}
        assert all(np.isfinite(float(v)) for v in losses.values())

        def total(p):
            return sum(det.apply({"params": p}, batch["img"],
                                 batch["gt_bboxes"], batch["gt_labels"],
                                 batch["gt_valid"], batch["img_shape"],
                                 batch["img_shape"],
                                 method=det.forward_train).values())

        g = jax.jit(jax.grad(total))(variables["params"])
        leaves = {"/".join(str(getattr(k, "key", k)) for k in path): v
                  for path, v in jax.tree_util.tree_flatten_with_path(g)[0]}
        gnorm = float(jnp.sqrt(sum(jnp.sum(x * x)
                                   for x in jax.tree.leaves(g))))
        assert np.isfinite(gnorm) and gnorm > 0
        # both dcn branches and the moment transfer actually learn
        moving = [k for k, v in leaves.items()
                  if float(jnp.max(jnp.abs(v))) > 0]
        assert any("reppoints_cls_conv_kernel" in k for k in moving)
        assert any("reppoints_pts_refine_conv_kernel" in k for k in moving)
        assert any("moment_transfer" in k for k in moving)

    def test_simple_test_fixed_shape(self, setup):
        det, variables, batch = setup
        dets, labels = jax.jit(lambda v, im, s: det.apply(
            v, im, s, jnp.ones((2,), jnp.float32), s,
            method=det.simple_test))(variables, batch["img"],
                                     batch["img_shape"])
        assert dets.shape == (2, 10, 5) and labels.shape == (2, 10)
        assert np.isfinite(np.asarray(dets)).all()

    def test_config_builds(self):
        from ioudet.utils.config import Config
        cfg = Config.fromfile("configs/reppoints_moment_r50_fpn_1x.py")
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det.bbox_head.transform_method == "moment"
        cfg2 = Config.fromfile("configs/reppoints_minmax_r50_fpn_1x.py")
        det2 = build_detector(cfg2.model, cfg2.train_cfg, cfg2.test_cfg)
        assert det2.bbox_head.transform_method == "minmax"
