# Fast R-CNN R-101-FPN 1x (ref: configs/fast_rcnn_r101_fpn_1x.py).
_base_ = "./fast_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/fast_rcnn_r101_fpn_1x"
