# Mask R-CNN R-50-FPN with GroupNorm, 2x (ref: configs/gn/
# mask_rcnn_r50_fpn_gn_2x.py): GN in backbone, FPN, 4conv1fc bbox head and
# mask head.
_base_ = "./mask_rcnn_r50_fpn_1x.py"
norm_cfg = dict(type="GN", num_groups=32)
model = dict(
    backbone=dict(norm_cfg=norm_cfg, frozen_stages=1),
    neck=dict(norm_cfg=norm_cfg),
    bbox_head=dict(_delete_=True, type="ConvFCBBoxHead",
                   num_shared_convs=4, num_shared_fcs=1,
                   conv_out_channels=256, fc_out_channels=1024,
                   num_classes=81, in_channels=256, roi_feat_size=7,
                   target_means=[0.0, 0.0, 0.0, 0.0],
                   target_stds=[0.1, 0.1, 0.2, 0.2], norm_cfg=norm_cfg),
    mask_head=dict(norm_cfg=norm_cfg),
)
lr_config = dict(step=[16, 22])
total_epochs = 24
work_dir = "./work_dirs/mask_rcnn_r50_fpn_gn_2x"
