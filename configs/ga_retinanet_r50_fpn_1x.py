# Guided-Anchoring RetinaNet R-50-FPN 1x (ref: configs/guided_anchoring/*).
_base_ = "iou_aware_retinanet_r50_fpn_1x.py"
model = dict(
    type="RetinaNet",
    bbox_head=dict(type="GARetinaHead", loss_iou_weight=None,
                   octave_base_scale=8, scales_per_octave=3,
                   anchor_ratios=[0.5, 1.0, 2.0],
                   anchor_strides=[8, 16, 32, 64, 128]),
)
test_cfg = dict(rescoring_alpha=None)
work_dir = "./work_dirs/ga_retinanet_r50_fpn_1x"
