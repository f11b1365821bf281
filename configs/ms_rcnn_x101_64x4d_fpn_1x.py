# Mask Scoring R-CNN X-101-64x4d-FPN 1x (ref: configs/ms_rcnn/ms_rcnn_x101_64x4d_fpn_1x.py).
_base_ = "./ms_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101, groups=64,
                           base_width=4, num_stages=4, out_indices=(0, 1, 2, 3),
                           frozen_stages=1, norm_cfg=dict(type="FrozenBN")))
work_dir = "./work_dirs/ms_rcnn_x101_64x4d_fpn_1x"
