# FoveaBox align + GN R-50-FPN 4gpu 2x (ref: configs/foveabox/
# fovea_align_r50_fpn_gn-head_4x4_2x): deformable feature alignment on the
# cls branch (offsets from the detached box field) + GN towers.
_base_ = "./fovea_r50_fpn_4gpu_1x.py"
model = dict(
    bbox_head=dict(with_deform=True, norm="GN"),
)
lr_config = dict(step=[16, 22])
total_epochs = 24
work_dir = "./work_dirs/fovea_align_gn_r50_fpn_4gpu_2x"
