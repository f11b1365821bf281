"""FoveaBox head: target-assignment goldens vs a literal numpy transcription
of the reference's sequential overwrite loop, decode formula check, and
end-to-end train/test through the detector (ref: mmdet/models/anchor_heads/
fovea_head.py (FoveaHead))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.models import build_detector
from ioudet.models.heads.fovea_head import FoveaHead


# ----------------------------------------------------------------- targets

def oracle_fovea_targets(feat_size, stride, base_len, scale_range, sigma,
                         gts, labels):
    """Reference loop: gts sorted by descending area overwrite label/target
    maps in place, so the smallest box wins contested cells."""
    h, w = feat_size
    lab = np.zeros((h, w), int)
    tgt = np.ones((h, w, 4), np.float32)
    edge = np.sqrt((gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]))
    hit = np.nonzero((edge >= scale_range[0]) & (edge <= scale_range[1]))[0]
    order = hit[np.argsort(-edge[hit])]
    for i in order:
        g = gts[i] / stride
        half_w = 0.5 * (g[2] - g[0])
        half_h = 0.5 * (g[3] - g[1])
        l = int(np.clip(np.ceil(g[0] + (1 - sigma) * half_w - 0.5), 0, w - 1))
        r = int(np.clip(np.floor(g[0] + (1 + sigma) * half_w - 0.5), 0, w - 1))
        t = int(np.clip(np.ceil(g[1] + (1 - sigma) * half_h - 0.5), 0, h - 1))
        d = int(np.clip(np.floor(g[1] + (1 + sigma) * half_h - 0.5), 0, h - 1))
        for py in range(t, d + 1):
            for px in range(l, r + 1):
                lab[py, px] = labels[i]
                x = (px + 0.5) * stride
                y = (py + 0.5) * stride
                tgt[py, px] = [(x - gts[i][0]) / base_len,
                               (y - gts[i][1]) / base_len,
                               (gts[i][2] - x) / base_len,
                               (gts[i][3] - y) / base_len]
    return lab.reshape(-1), np.log(np.clip(tgt, 1.0 / 16, 16.0)).reshape(-1, 4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fovea_targets_match_reference_loop(seed):
    rng = np.random.default_rng(seed)
    G = 6
    xy = rng.uniform(0, 80, (G, 2)).astype(np.float32)
    wh = rng.uniform(8, 120, (G, 2)).astype(np.float32)
    gts = np.concatenate([xy, xy + wh], -1)
    labels = rng.integers(1, 5, G)
    head = FoveaHead(num_classes=6)
    for feat_size, stride, base_len, srange in [
            ((16, 24), 8, 16, (1, 64)), ((8, 12), 16, 32, (32, 128)),
            ((4, 6), 32, 64, (64, 256))]:
        exp_lab, exp_tgt = oracle_fovea_targets(
            feat_size, stride, base_len, srange, 0.4, gts, labels)
        lab, tgt = head._targets_level(
            feat_size, stride, base_len, srange, jnp.asarray(gts),
            jnp.ones(G, bool), jnp.asarray(labels, jnp.int32))
        np.testing.assert_array_equal(np.asarray(lab), exp_lab)
        # oracle keeps log(1)=0 for background; ours zeroes explicitly
        np.testing.assert_allclose(np.asarray(tgt), exp_tgt,
                                   rtol=1e-5, atol=1e-5)


def test_fovea_targets_ignore_padded_gts():
    head = FoveaHead(num_classes=4)
    gts = np.asarray([[8, 8, 40, 40], [8, 8, 40, 40]], np.float32)
    lab, _ = head._targets_level(
        (8, 8), 8, 16, (1, 64), jnp.asarray(gts),
        jnp.asarray([False, True]), jnp.asarray([2, 3], jnp.int32))
    lab = np.asarray(lab)
    assert (lab == 2).sum() == 0 and (lab == 3).sum() > 0


def test_fovea_smallest_box_wins_contested_cells():
    head = FoveaHead(num_classes=4)
    gts = np.asarray([[0, 0, 60, 60], [10, 10, 50, 50]], np.float32)
    lab, _ = head._targets_level(
        (8, 8), 8, 16, (1, 1000), jnp.asarray(gts),
        jnp.ones(2, bool), jnp.asarray([1, 2], jnp.int32))
    lab = np.asarray(lab).reshape(8, 8)
    assert lab[3, 3] == 2  # center cell: inner (smaller) box wins
    assert (lab == 1).sum() > 0  # outer box keeps its exclusive ring


# ------------------------------------------------------------- end to end

CFG = dict(
    type="FOVEA",
    backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                  norm_cfg=dict(type="FrozenBN")),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=1, add_extra_convs=True, num_outs=5),
    bbox_head=dict(type="FoveaHead", num_classes=4, in_channels=32,
                   feat_channels=32, stacked_convs=1,
                   strides=(8, 16, 32, 64, 128),
                   base_edge_list=(16, 32, 64, 128, 256),
                   scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512),
                                 (256, 2048))))
TEST_CFG = dict(nms_pre=50, score_thr=0.01, nms=dict(iou_thr=0.5),
                max_per_img=10)


def make_batch():
    rng = np.random.default_rng(0)
    B, G = 2, 3
    img = jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)), jnp.float32)
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    return dict(
        img=img,
        gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
        gt_labels=jnp.asarray(rng.integers(1, 4, (B, G)), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        img_shape=jnp.tile(jnp.asarray([[64, 96]], jnp.int32), (B, 1)),
        scale_factor=jnp.ones((B,), jnp.float32))


class TestFoveaEndToEnd:
    @pytest.fixture(scope="class", params=[False, True],
                    ids=["plain", "align"])
    def setup(self, request):
        cfg = dict(CFG)
        cfg["bbox_head"] = dict(cfg["bbox_head"],
                                with_deform=request.param,
                                norm="GN" if request.param else None)
        det = build_detector(cfg, dict(), dict(TEST_CFG))
        batch = make_batch()
        variables = det.init(jax.random.PRNGKey(0), batch["img"])
        return det, variables, batch

    def test_forward_shapes(self, setup):
        det, variables, batch = setup
        cls, reg = det.apply(variables, batch["img"])
        assert len(cls) == 5 and len(reg) == 5
        assert cls[0].shape == (2, 8, 12, 3)
        assert reg[0].shape == (2, 8, 12, 4)

    def test_losses_finite_and_grads_flow(self, setup):
        det, variables, batch = setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], method=det.forward_train))(
                variables, batch)
        assert set(losses) == {"loss_cls", "loss_bbox"}
        assert all(np.isfinite(float(v)) for v in losses.values())

        def total(p):
            return sum(det.apply({"params": p}, batch["img"],
                                 batch["gt_bboxes"], batch["gt_labels"],
                                 batch["gt_valid"], batch["img_shape"],
                                 batch["img_shape"],
                                 method=det.forward_train).values())

        g = jax.jit(jax.grad(total))(variables["params"])
        gnorm = float(jnp.sqrt(sum(jnp.sum(x * x)
                                   for x in jax.tree.leaves(g))))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_simple_test_shapes(self, setup):
        det, variables, batch = setup
        dets, labels = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], b["scale_factor"], b["img_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 10, 5) and labels.shape == (2, 10)


def test_fovea_decode_formula():
    """A single hot cell decodes to center +- base_len * exp(pred)."""
    head = FoveaHead(num_classes=3, strides=(8,), base_edge_list=(16,),
                     scale_ranges=((1, 64),))
    B, h, w = 1, 4, 4
    cls = np.full((B, h, w, 2), -20.0, np.float32)
    cls[0, 1, 2, 1] = 4.0
    reg = np.zeros((B, h, w, 4), np.float32)
    reg[0, 1, 2] = np.log([0.5, 1.0, 1.5, 2.0])
    boxes, scores = head.decode_candidates(
        [jnp.asarray(cls)], [jnp.asarray(reg)],
        jnp.asarray([[32, 32]], jnp.int32), dict(nms_pre=16))
    top = np.asarray(boxes[0][np.argmax(np.asarray(scores[0]).max(-1))])
    cx, cy = (2 + 0.5) * 8, (1 + 0.5) * 8
    exp = np.clip([cx - 16 * 0.5, cy - 16 * 1.0, cx + 16 * 1.5,
                   cy + 16 * 2.0], 0, 31)  # ref clamps to [0, size-1]
    np.testing.assert_allclose(top, exp, rtol=1e-5)
