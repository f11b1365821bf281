"""ConvWS2d + the GN / GN+WS / scratch family (VERDICT r2 item 6).

Ref: mmdet/models/utils/conv_ws.py (ConvWS2d, conv_ws_2d), configs/gn/,
configs/gn+ws/, configs/scratch/."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ioudet.models import build_detector
from ioudet.models.utils import ConvWS, conv_class


class TestConvWS:
    def test_matches_torch_derivation(self):
        """Independent torch re-derivation of ConvWS2d: standardize the
        kernel over (out-channel rows), then plain conv."""
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (2, 10, 10, 6)).astype(np.float32)
        conv = ConvWS(8, (3, 3), padding=1, use_bias=True)
        v = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        k = np.asarray(v["params"]["kernel"])  # HWIO
        b = np.asarray(v["params"]["bias"])

        tw = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())  # OIHW
        mean = tw.mean(dim=[1, 2, 3], keepdim=True)
        std = tw.reshape(tw.shape[0], -1).std(dim=1, unbiased=False).reshape(
            -1, 1, 1, 1)
        tw = (tw - mean) / (std + 1e-5)
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ty = F.conv2d(tx, tw, torch.from_numpy(b), padding=1)

        y = conv.apply(v, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y), np.transpose(ty.numpy(), (0, 2, 3, 1)),
            rtol=1e-4, atol=1e-4)

    def test_invariant_to_kernel_affine(self):
        """Standardization removes per-channel scale/shift of the kernel —
        the defining property of weight standardization."""
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        conv = ConvWS(4, (3, 3), padding=1, use_bias=False)
        v = conv.init(jax.random.PRNGKey(2), x)
        y0 = conv.apply(v, x)
        k = v["params"]["kernel"]
        v2 = {"params": {"kernel": k * 3.7 + jnp.mean(k) * 0.5}}
        y1 = conv.apply(v2, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-4, atol=1e-4)

    def test_param_tree_matches_nn_conv(self):
        import flax.linen as nn
        x = jnp.zeros((1, 8, 8, 4))
        v_ws = ConvWS(4, (3, 3), padding=1).init(jax.random.PRNGKey(0), x)
        v_nn = nn.Conv(4, (3, 3), padding=1).init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(v_ws) == jax.tree.structure(v_nn)
        assert all(a.shape == b.shape for a, b in zip(
            jax.tree.leaves(v_ws), jax.tree.leaves(v_nn)))

    def test_conv_class_factory(self):
        import flax.linen as nn
        assert conv_class(None) is nn.Conv
        assert conv_class(dict(type="Conv")) is nn.Conv
        assert conv_class(dict(type="ConvWS")) is ConvWS


def _gn_ws_detector(conv_cfg, norm_cfg, zero_init=False):
    return build_detector(dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                      conv_cfg=conv_cfg, norm_cfg=norm_cfg,
                      zero_init_residual=zero_init),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5, conv_cfg=conv_cfg,
                  norm_cfg=norm_cfg),
        rpn_head=dict(type="RPNHead", num_classes=2, in_channels=64,
                      feat_channels=64, anchor_scales=(8,),
                      anchor_ratios=(0.5, 1.0, 2.0),
                      anchor_strides=(4, 8, 16, 32, 64),
                      loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                    gamma=2.0, alpha=0.25, loss_weight=1.0),
                      loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                     loss_weight=1.0)),
        bbox_roi_extractor=dict(type="SingleRoIExtractor", out_channels=64,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=7, sample_num=2)),
        bbox_head=dict(type="ConvFCBBoxHead", num_shared_convs=2,
                       num_shared_fcs=1, conv_out_channels=64,
                       fc_out_channels=64, num_classes=5, in_channels=64,
                       conv_cfg=conv_cfg, norm_cfg=norm_cfg)),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3),
                      allowed_border=0),
             rpn_proposal=dict(nms_pre=100, max_num=32, nms_thr=0.7),
             rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                     min_pos_iou=0.5),
                       sampler=dict(num=16, pos_fraction=0.25))),
        dict(rpn=dict(nms_pre=100, max_num=32, nms_thr=0.7),
             rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                       max_per_img=8)))


class TestGNWSFamily:
    def _batch(self, B=2, G=3, canvas=(64, 96)):
        rng = np.random.default_rng(0)
        xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
        return dict(
            img=jnp.asarray(rng.normal(0, 1, (B,) + canvas + (3,)),
                            jnp.float32),
            gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
            gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
            gt_valid=jnp.ones((B, G), bool),
            img_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32),
                               (B, 1)))

    def test_gn_ws_train_and_test(self):
        det = _gn_ws_detector(dict(type="ConvWS"),
                              dict(type="GN", num_groups=8))
        b = self._batch()
        variables = det.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(1)},
            b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], method=det.forward_train)
        losses = det.apply(variables, b["img"], b["gt_bboxes"],
                           b["gt_labels"], b["gt_valid"], b["img_shape"],
                           b["img_shape"], method=det.forward_train,
                           rngs={"sampler": jax.random.PRNGKey(2)})
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, v)
        dets, labels = det.apply(
            variables, b["img"], b["img_shape"], jnp.ones((2,), jnp.float32),
            b["img_shape"], method=det.simple_test)
        assert dets.shape == (2, 8, 5)
        # GN params present in the backbone tree
        assert "bn1" in variables["params"]["backbone"]
        assert "scale" in variables["params"]["backbone"]["bn1"]

    def test_zero_init_residual(self):
        det = _gn_ws_detector(None, dict(type="GN", num_groups=8),
                              zero_init=True)
        b = self._batch()
        variables = det.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(1)},
            b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], method=det.forward_train)
        bb = variables["params"]["backbone"]
        # last norm of each residual block starts at zero scale...
        np.testing.assert_allclose(
            np.asarray(bb["layer1_0"]["bn2"]["scale"]), 0.0)
        # ...but the non-residual norms do not
        np.testing.assert_allclose(
            np.asarray(bb["layer1_0"]["bn1"]["scale"]), 1.0)
