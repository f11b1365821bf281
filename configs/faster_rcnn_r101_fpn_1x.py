# Faster R-CNN R-101-FPN 1x (ref: configs/faster_rcnn_r101_fpn_1x.py).
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/faster_rcnn_r101_fpn_1x"
