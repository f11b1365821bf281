# Libra RetinaNet R-50-FPN (ref: configs/libra_rcnn/
# libra_retinanet_r50_fpn_1x.py): BFP + Balanced L1 on the single-stage head.
_base_ = "./retinanet_r50_fpn_1x.py"
model = dict(
    neck=[
        dict(type="FPN", in_channels=[256, 512, 1024, 2048],
             out_channels=256, start_level=1, add_extra_convs=True,
             num_outs=5),
        dict(type="BFP", in_channels=256, num_levels=5, refine_level=2,
             refine_type="non_local"),
    ],
    bbox_head=dict(
        loss_bbox=dict(type="BalancedL1Loss", alpha=0.5, gamma=1.5,
                       beta=0.11, loss_weight=1.0)),
)
work_dir = "./work_dirs/libra_retinanet_r50_fpn_1x"
