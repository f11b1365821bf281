# Mask R-CNN R-50-FPN trained FROM SCRATCH with GN, 6x schedule (ref:
# configs/scratch/scratch_mask_rcnn_r50_fpn_gn_6x.py, "Rethinking ImageNet
# Pre-training"): no pretrained weights, nothing frozen, GN everywhere,
# 6x-long schedule.
_base_ = "./mask_rcnn_r50_fpn_gn_2x.py"
model = dict(
    backbone=dict(frozen_stages=-1, zero_init_residual=False),
)
lr_config = dict(step=[65, 71])
total_epochs = 73
work_dir = "./work_dirs/scratch_mask_rcnn_r50_fpn_gn_6x"
