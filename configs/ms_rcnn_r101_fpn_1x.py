# Mask Scoring R-CNN R-101-FPN 1x (ref: configs/ms_rcnn/ms_rcnn_r101_fpn_1x.py).
_base_ = "./ms_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/ms_rcnn_r101_fpn_1x"
