# RetinaNet X-101-64x4d-FPN 1x (ref: configs/retinanet_x101_64x4d_fpn_1x.py).
_base_ = "./retinanet_r50_fpn_1x.py"
model = dict(backbone=dict(type="ResNeXt", depth=101, groups=64,
                           base_width=4))
work_dir = "./work_dirs/retinanet_x101_64x4d_fpn_1x"
