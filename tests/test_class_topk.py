"""class_topk pruning in multiclass_nms: exact when every anchor has at most
k classes above the score threshold; disabled (None) path identical to the
round-1 behavior (TPU perf optimization — the flat N*C sort is the NMS
bottleneck; see bbox_nms.multiclass_nms docstring)."""

import numpy as np
import jax.numpy as jnp

from ioudet.core.post_processing import multiclass_nms


def _random_candidates(n=300, C=12, sparse=3, seed=0):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(20, 200, (n, 2)).astype(np.float32)
    wh = rng.uniform(10, 60, (n, 2)).astype(np.float32)
    boxes = np.concatenate([cx - wh / 2, cx + wh / 2], -1)
    # at most `sparse` classes above threshold per anchor
    scores = np.zeros((n, C), np.float32)
    for i in range(n):
        cls = rng.choice(C, sparse, replace=False)
        scores[i, cls] = rng.uniform(0.06, 1.0, sparse)
    return jnp.asarray(boxes), jnp.asarray(scores)


class TestClassTopk:
    def test_exact_when_sparse(self):
        boxes, scores = _random_candidates(sparse=3)
        kw = dict(score_thr=0.05, iou_thr=0.5, max_per_img=50,
                  pre_nms_total=256)
        d0, l0 = multiclass_nms(boxes, scores, **kw)
        d4, l4 = multiclass_nms(boxes, scores, class_topk=4, **kw)
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d4), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l4))

    def test_topk_ge_classes_is_noop(self):
        boxes, scores = _random_candidates(sparse=6)
        kw = dict(score_thr=0.05, iou_thr=0.5, max_per_img=50,
                  pre_nms_total=256)
        d0, l0 = multiclass_nms(boxes, scores, **kw)
        d1, l1 = multiclass_nms(boxes, scores, class_topk=12, **kw)
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    def test_config_plumbing(self):
        """test_cfg.class_topk reaches multiclass_nms through get_bboxes'
        _batched_nms path."""
        import jax
        from ioudet.models import build_detector

        cfg = dict(
            type="IoUAwareRetinaNet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                          norm_cfg=dict(type="FrozenBN")),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, start_level=1, add_extra_convs=True,
                      num_outs=5),
            bbox_head=dict(type="IoUAwareRetinaHead", num_classes=9,
                           in_channels=32, feat_channels=32, stacked_convs=1,
                           anchor_strides=(8, 16, 32, 64, 128)))
        test_cfg = dict(nms_pre=50, score_thr=0.05, nms=dict(iou_thr=0.5),
                        max_per_img=10, rescoring_alpha=0.5, class_topk=2)
        det = build_detector(cfg, None, test_cfg)
        img = jnp.zeros((1, 64, 96, 3))
        shapes = jnp.asarray([[64, 96]], jnp.int32)
        variables = det.init(jax.random.PRNGKey(0), img)
        dets, labels = det.apply(variables, img, shapes,
                                 jnp.ones((1,), jnp.float32), shapes,
                                 method=det.simple_test)
        assert dets.shape == (1, 10, 5)
        assert np.isfinite(np.asarray(dets)).all()
