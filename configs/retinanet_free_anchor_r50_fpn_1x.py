# FreeAnchor RetinaNet R-50-FPN 1x (ref: configs/free_anchor/* vintage).
_base_ = "iou_aware_retinanet_r50_fpn_1x.py"
model = dict(
    type="RetinaNet",
    bbox_head=dict(type="FreeAnchorRetinaHead", loss_iou_weight=None,
                   pre_anchor_topk=50, bbox_thr=0.6, gamma=2.0, alpha=0.5),
)
test_cfg = dict(rescoring_alpha=None)
work_dir = "./work_dirs/retinanet_free_anchor_r50_fpn_1x"
