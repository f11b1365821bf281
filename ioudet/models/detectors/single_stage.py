"""Single-stage detector (ref: mmdet/models/detectors/single_stage.py
(SingleStageDetector) + base.py (BaseDetector)).

A flax module composing backbone -> neck -> head.  The reference's
``forward(return_loss=...)`` dispatch becomes three explicit apply-methods:

  * ``__call__(images)``        -> raw head outputs (the jittable core)
  * ``forward_train(batch)``    -> loss dict (head.loss on fixed-shape targets)
  * ``simple_test(images, ...)``-> (dets (B, max_per_img, 5), labels) fixed-shape

``aug_test`` (multi-scale TTA) lives in apis/test.py as a host-side merge of
``simple_test``-style calls per view (ref: merge_aug_bboxes semantics —
upstream single-stage aug_test was NotImplemented; we support it).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..registry import DETECTORS


@DETECTORS.register_module
class SingleStageDetector(nn.Module):
    backbone: nn.Module
    bbox_head: nn.Module
    neck: Optional[nn.Module] = None
    train_cfg: Any = None
    test_cfg: Any = None

    def extract_feat(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        return x

    def __call__(self, img, train: bool = False):
        x = self.extract_feat(img, train=train)
        return self.bbox_head(x, train=train)

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid,
                      img_shapes, pad_shapes,
                      gt_bboxes_ignore=None, gt_ignore_valid=None):
        outs = self(img, train=True)
        kw = {}
        if gt_bboxes_ignore is not None:
            # crowd/ignore regions (B, I, 4) + mask: consumed by the
            # assigner's ignore_iof_thr path (ref: anchor_target_single)
            kw = dict(gt_bboxes_ignore=gt_bboxes_ignore,
                      gt_ignore_valid=gt_ignore_valid)
        return self.bbox_head.loss(*outs, gt_bboxes, gt_labels, gt_valid,
                                   img_shapes, pad_shapes,
                                   dict(self.train_cfg or {}), **kw)

    def simple_test(self, img, img_shapes, scale_factors, pad_shapes,
                    rescale: bool = True):
        outs = self(img, train=False)
        return self.bbox_head.get_bboxes(*outs, img_shapes, scale_factors,
                                         pad_shapes, dict(self.test_cfg or {}),
                                         rescale=rescale)


@DETECTORS.register_module
class RetinaNet(SingleStageDetector):
    """Registration shim (ref: mmdet/models/detectors/retinanet.py)."""


@DETECTORS.register_module
class IoUAwareRetinaNet(SingleStageDetector):
    """The fork's detector: SingleStage + IoUAwareRetinaHead."""


@DETECTORS.register_module
class FCOS(SingleStageDetector):
    """ref: mmdet/models/detectors/fcos.py — registration shim."""


@DETECTORS.register_module
class SSD(SingleStageDetector):
    """SSD = SSDVGG backbone + SSDHead, no neck."""


@DETECTORS.register_module
class RepPointsDetector(SingleStageDetector):
    """ref: mmdet/models/detectors/reppoints_detector.py — registration
    shim (its aug-merge override is subsumed by apis/test.py::aug_test)."""


@DETECTORS.register_module
class FOVEA(SingleStageDetector):
    """ref: mmdet/models/detectors/fovea.py — registration shim."""
