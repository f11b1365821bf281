# FCOS X-101-64x4d multi-scale 2x (ref: configs/fcos/
# fcos_mstrain_640_800_x101_64x4d_fpn_gn_2x.py).
_base_ = "./fcos_mstrain_640_800_r101_caffe_fpn_gn_2x_4gpu.py"
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101,
                           groups=64, base_width=4, num_stages=4,
                           out_indices=(0, 1, 2, 3), frozen_stages=1,
                           norm_cfg=dict(type="FrozenBN")))
work_dir = "./work_dirs/fcos_mstrain_640_800_x101_64x4d_fpn_gn_2x"
