"""Fused Pallas anchor assignment == the XLA anchor_target path, elementwise.

The kernel (ioudet/ops/assign_pallas.py) replaces the (G, A)-matrix
assignment for the default configuration; these tests pin it to the
reference-semantics XLA implementation (anchor_target_single) on adversarial
cases: ties forcing the later-gt-wins rule, invalid gts/anchors, thresholds,
min_pos_iou > 0, pos_weight, non-128-aligned anchor counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ioudet.core.anchor.anchor_target import (AnchorTargets, anchor_target,
                                              anchor_target_single)
from ioudet.core.bbox import MaxIoUAssigner
from ioudet.ops.assign_pallas import fused_anchor_assign


def _reference(anchors, valid, gt, gtv, gtl, assigner, means, stds,
               pos_weight=-1.0):
    img_shapes = jnp.tile(jnp.asarray([[1000, 1000]], jnp.int32),
                          (valid.shape[0], 1))
    def single(vf, gb, gv, gl, shape):
        return anchor_target_single(anchors, vf, gb, gv, gl, shape,
                                    assigner, means, stds,
                                    allowed_border=-1,
                                    pos_weight=pos_weight)
    return jax.vmap(single)(valid, gt, gtv, gtl, img_shapes)


def _random_case(rng, B, A, G, dup_frac=0.3):
    xy = rng.uniform(0, 600, (B, G, 2)).astype(np.float32)
    wh = rng.uniform(8, 300, (B, G, 2)).astype(np.float32)
    gt = np.concatenate([xy, xy + wh], -1)
    # duplicate some gts so step-4 ties actually occur
    ndup = int(G * dup_frac)
    if ndup:
        src = rng.integers(0, G, (B, ndup))
        dst = rng.integers(0, G, (B, ndup))
        for b in range(B):
            gt[b, dst[b]] = gt[b, src[b]]
    axy = rng.uniform(0, 640, (A, 2)).astype(np.float32)
    awh = rng.uniform(4, 256, (A, 2)).astype(np.float32)
    anchors = np.concatenate([axy, axy + awh], -1)
    # make some anchors exactly equal to gt boxes (IoU exactly 1 ties)
    hits = rng.integers(0, A, 40)
    anchors[hits] = gt[rng.integers(0, B, 40), rng.integers(0, G, 40)]
    valid = rng.uniform(size=(B, A)) < 0.9
    gtv = rng.uniform(size=(B, G)) < 0.7
    gtl = rng.integers(1, 21, (B, G)).astype(np.int32)
    return (jnp.asarray(anchors), jnp.asarray(valid), jnp.asarray(gt),
            jnp.asarray(gtv), jnp.asarray(gtl))


def _check(fused, ref, pw=1.0):
    labels, lw, posf, bt, pgb = fused
    rl, rlw, rbt, rbw, rpgb, rnpos, rnneg = ref
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(rl))
    np.testing.assert_allclose(np.asarray(lw), np.asarray(rlw), atol=0)
    np.testing.assert_allclose(np.asarray(posf), np.asarray(rbw[..., 0]),
                               atol=0)
    np.testing.assert_allclose(np.asarray(bt), np.asarray(rbt),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pgb), np.asarray(rpgb),
                               rtol=1e-6, atol=1e-6)


MEANS = (0.0, 0.0, 0.0, 0.0)
STDS = (0.1, 0.1, 0.2, 0.2)


@pytest.mark.parametrize("A", [500, 4096, 9000])
@pytest.mark.parametrize("min_pos,pw", [(0.0, -1.0), (0.3, 2.0)])
def test_fused_matches_xla(A, min_pos, pw):
    rng = np.random.default_rng(42 + A)
    B, G = 3, 17
    anchors, valid, gt, gtv, gtl = _random_case(rng, B, A, G)
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=min_pos)
    ref = _reference(anchors, valid, gt, gtv, gtl, assigner, MEANS, STDS,
                     pos_weight=pw)
    fused = fused_anchor_assign(
        anchors, valid, gt, gtv, gtl, pos_iou_thr=0.5, neg_iou_thr=0.4,
        min_pos_iou=min_pos, pos_weight=(1.0 if pw <= 0 else pw),
        target_means=MEANS, target_stds=STDS)
    _check(fused, ref)
    # positives exist (the planted exact-match anchors guarantee it)
    assert float(jnp.sum(fused[2])) > 0


def test_all_gts_invalid():
    rng = np.random.default_rng(0)
    anchors, valid, gt, gtv, gtl = _random_case(rng, 2, 700, 5)
    gtv = jnp.zeros_like(gtv)
    fused = fused_anchor_assign(anchors, valid, gt, gtv, gtl,
                                pos_iou_thr=0.5, neg_iou_thr=0.4)
    labels, lw, posf, bt, pgb = fused
    assert float(jnp.sum(posf)) == 0
    assert float(jnp.sum(labels)) == 0
    assert np.all(np.asarray(bt) == 0)
    assert bool(jnp.all(jnp.isfinite(bt)))


def test_anchor_target_routes_to_fused():
    """anchor_target's default path returns the fused results (same values,
    same AnchorTargets contract incl. pos/neg counts)."""
    rng = np.random.default_rng(7)
    anchors, valid, gt, gtv, gtl = _random_case(rng, 2, 1500, 9)
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0.0)
    img_shapes = jnp.tile(jnp.asarray([[1000, 1000]], jnp.int32), (2, 1))
    out = anchor_target(anchors, valid, gt, gtv, gtl, img_shapes, assigner,
                        MEANS, STDS)
    assert isinstance(out, AnchorTargets)
    ref = _reference(anchors, valid, gt, gtv, gtl, assigner, MEANS, STDS)
    np.testing.assert_array_equal(np.asarray(out.labels), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(out.bbox_targets),
                               np.asarray(ref[2]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.bbox_weights),
                               np.asarray(ref[3]), atol=0)
    np.testing.assert_allclose(np.asarray(out.pos_gt_boxes),
                               np.asarray(ref[4]), rtol=1e-6, atol=1e-6)
    assert int(out.num_total_pos) == int(jnp.sum(ref[5]))
    assert int(out.num_total_neg) == int(jnp.sum(ref[6]))


def test_ignore_regions_still_use_xla_path():
    """The ignore-region path must NOT route to the kernel (it has no
    ignore support) — spot-check that ignore regions still take effect."""
    anchors = jnp.asarray([[0., 0., 99., 99.], [200., 200., 299., 299.]])
    valid = jnp.ones((1, 2), bool)
    gt = jnp.asarray([[[0., 0., 99., 99.]]])
    gtv = jnp.ones((1, 1), bool)
    gtl = jnp.ones((1, 1), jnp.int32)
    ign = jnp.asarray([[[190., 190., 310., 310.]]])
    ignv = jnp.ones((1, 1), bool)
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0.0, ignore_iof_thr=0.5)
    img_shapes = jnp.asarray([[1000, 1000]], jnp.int32)
    out = anchor_target(anchors, valid, gt, gtv, gtl, img_shapes, assigner,
                        MEANS, STDS, gt_bboxes_ignore=ign,
                        gt_ignore_valid=ignv)
    # anchor 1 sits inside the ignore region -> excluded (weight 0)
    assert float(out.label_weights[0, 1]) == 0.0
    assert float(out.label_weights[0, 0]) == 1.0
