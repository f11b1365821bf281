# Cascade R-CNN R-50-FPN 20e (ref: configs/cascade_rcnn_r50_fpn_20e.py —
# the reference's longer cascade schedule: step [16, 19], 20 epochs).
_base_ = "./cascade_rcnn_r50_fpn_1x.py"
lr_config = dict(step=[16, 19])
total_epochs = 20
work_dir = "./work_dirs/cascade_rcnn_r50_fpn_20e"
