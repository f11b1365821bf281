# Libra Fast R-CNN R-50-FPN 1x (ref: configs/libra_rcnn/
# libra_fast_rcnn_r50_fpn_1x.py): precomputed proposals + BFP + balanced
# sampling/loss.
_base_ = "./fast_rcnn_r50_fpn_1x.py"
model = dict(
    neck=[
        dict(type="FPN", in_channels=[256, 512, 1024, 2048],
             out_channels=256, start_level=0, num_outs=5),
        dict(type="BFP", in_channels=256, num_levels=5, refine_level=2,
             refine_type="non_local"),
    ],
    bbox_head=dict(
        loss_bbox=dict(type="BalancedL1Loss", alpha=0.5, gamma=1.5,
                       beta=1.0, loss_weight=1.0)),
)
train_cfg = dict(
    rcnn=dict(sampler=dict(type="IoUBalancedNegSampler", num=512,
                           pos_fraction=0.25, floor_thr=-1, floor_fraction=0,
                           num_bins=3)),
)
work_dir = "./work_dirs/libra_fast_rcnn_r50_fpn_1x"
