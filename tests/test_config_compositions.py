"""Composition mechanisms behind the expanded config zoo: chained necks
(Libra's FPN->BFP), configurable second-stage reg loss (BalancedL1),
_delete_ type swaps, and RPN-only builds."""

import numpy as np
import jax
import jax.numpy as jnp


def test_neck_sequence_fpn_bfp_forward():
    from ioudet.models import build_detector
    from ioudet.utils.config import Config
    import os
    cfg = Config.fromfile(os.path.join(os.path.dirname(__file__), "..",
                                       "configs",
                                       "libra_faster_rcnn_r50_fpn_1x.py"))
    det = build_detector(dict(cfg.model), cfg.train_cfg, cfg.test_cfg)
    from ioudet.models.necks import NeckSequence
    assert isinstance(det.neck, NeckSequence) and len(det.neck.necks) == 2


def test_bbox_head_balanced_l1():
    from ioudet.models.bbox_heads import BBoxHead
    head = BBoxHead(num_classes=4, in_channels=8, with_avg_pool=True,
                    loss_bbox=dict(type="BalancedL1Loss", alpha=0.5,
                                   gamma=1.5, beta=1.0, loss_weight=1.0))
    rng = np.random.default_rng(0)
    R = 16
    cls = jnp.asarray(rng.normal(0, 1, (R, 4)), jnp.float32)
    reg = jnp.asarray(rng.normal(0, 1, (R, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, (R,)), jnp.int32)
    lw = jnp.ones((R,))
    bt = jnp.asarray(rng.normal(0, 1, (R, 4)), jnp.float32)
    bw = jnp.asarray((labels > 0)[:, None] * jnp.ones((R, 4)), jnp.float32)
    losses = head.loss(cls, reg, labels, lw, bt, bw)
    assert np.isfinite(float(losses["loss_bbox"]))
    # differs from the smooth-L1 default
    base = BBoxHead(num_classes=4, in_channels=8, with_avg_pool=True)
    l2 = base.loss(cls, reg, labels, lw, bt, bw)
    assert abs(float(losses["loss_bbox"]) - float(l2["loss_bbox"])) > 1e-6


def test_delete_swaps_component_type():
    from ioudet.utils.config import _merge_dict
    base = dict(backbone=dict(type="ResNet", depth=50, frozen_stages=1))
    new = dict(backbone=dict(type="HRNet", _delete_=True, extra=dict(a=1)))
    out = _merge_dict(base, new)
    assert out["backbone"] == dict(type="HRNet", extra=dict(a=1))


def test_rpn_only_and_hrnet_builds_forward():
    """HRNet-FPN faster config and the GA-RPN config must not only build
    but run a tiny forward (catches field leaks past _delete_)."""
    from ioudet.models import build_detector
    det = build_detector(dict(
        type="RPN",
        backbone=dict(type="HRNet", extra=dict(
            stage1=dict(num_modules=1, num_branches=1, num_blocks=(1,),
                        num_channels=(16,)),
            stage2=dict(num_modules=1, num_branches=2, num_blocks=(1, 1),
                        num_channels=(8, 16)),
            stage3=dict(num_modules=1, num_branches=3, num_blocks=(1, 1, 1),
                        num_channels=(8, 16, 32)),
            stage4=dict(num_modules=1, num_branches=4,
                        num_blocks=(1, 1, 1, 1),
                        num_channels=(8, 16, 32, 64)))),
        neck=dict(type="HRFPN", in_channels=[8, 16, 32, 64],
                  out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", num_classes=2, in_channels=16,
                      feat_channels=16, anchor_scales=(8,),
                      anchor_ratios=(0.5, 1.0, 2.0),
                      anchor_strides=(4, 8, 16, 32, 64),
                      loss_cls=dict(type="CrossEntropyLoss",
                                    use_sigmoid=True, loss_weight=1.0),
                      loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                     loss_weight=1.0))),
        None, dict(nms_pre=50, max_num=16, nms_thr=0.7))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), img)
    outs = det.apply(variables, img)
    assert len(outs[0]) == 5  # five pyramid levels of cls scores
