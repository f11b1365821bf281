# Cascade Mask R-CNN R-101-FPN 1x (ref: configs/cascade_mask_rcnn_r101_fpn_1x.py).
_base_ = "./cascade_mask_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/cascade_mask_rcnn_r101_fpn_1x"
