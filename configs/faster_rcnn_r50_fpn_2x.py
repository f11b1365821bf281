# Faster R-CNN R-50-FPN 2x (ref: configs/faster_rcnn_r50_fpn_2x.py).
_base_ = "./faster_rcnn_r50_fpn_1x.py"
lr_config = dict(step=[16, 22])
total_epochs = 24
work_dir = "./work_dirs/faster_rcnn_r50_fpn_2x"
