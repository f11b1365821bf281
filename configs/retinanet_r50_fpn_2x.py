# RetinaNet R-50-FPN 2x schedule (ref: configs/retinanet_r50_fpn_2x-vintage).
_base_ = "./retinanet_r50_fpn_1x.py"
lr_config = dict(step=[16, 22])
total_epochs = 24
work_dir = "./work_dirs/retinanet_r50_fpn_2x"
