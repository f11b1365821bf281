# Vanilla RetinaNet R-50-FPN 1x — the baseline for the fork's delta claims
# (ref: configs/retinanet_r50_fpn_1x.py)
_base_ = "iou_aware_retinanet_r50_fpn_1x.py"
model = dict(
    type="RetinaNet",
    bbox_head=dict(type="RetinaHead", loss_iou_weight=None),
)
test_cfg = dict(rescoring_alpha=None)
work_dir = "./work_dirs/retinanet_r50_fpn_1x"
