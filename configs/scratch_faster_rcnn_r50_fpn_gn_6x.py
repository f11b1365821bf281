# Faster R-CNN R-50-FPN trained FROM SCRATCH with GN, 6x schedule (ref:
# configs/scratch/scratch_faster_rcnn_r50_fpn_gn_6x.py).
_base_ = "./faster_rcnn_r50_fpn_gn_ws_1x.py"
model = dict(
    backbone=dict(conv_cfg=None, frozen_stages=-1,
                  zero_init_residual=False),
    neck=dict(conv_cfg=None),
    bbox_head=dict(conv_cfg=None),
)
lr_config = dict(step=[65, 71])
total_epochs = 73
work_dir = "./work_dirs/scratch_faster_rcnn_r50_fpn_gn_6x"
