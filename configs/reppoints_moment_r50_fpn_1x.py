# RepPoints-moment R-50-FPN 1x (ref: configs/reppoints_moment_r50_fpn_1x.py
# at the mmdetection-v1 vintage): anchor-free point-set representation,
# moment transform, PointAssigner init stage + MaxIoU refine stage.
_base_ = "./fcos_r50_fpn_1x.py"
model = dict(
    type="RepPointsDetector",
    bbox_head=dict(
        _delete_=True, type="RepPointsHead", num_classes=81, in_channels=256,
        feat_channels=256, point_feat_channels=256, stacked_convs=3,
        num_points=9, gradient_mul=0.1, point_strides=[8, 16, 32, 64, 128],
        point_base_scale=4, transform_method="moment",
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox_init=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                            loss_weight=0.5),
        loss_bbox_refine=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                              loss_weight=1.0)),
)
train_cfg = dict(
    init=dict(assigner=dict(type="PointAssigner", scale=4, pos_num=1),
              allowed_border=-1, pos_weight=-1),
    refine=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                              neg_iou_thr=0.4, min_pos_iou=0,
                              ignore_iof_thr=-1),
                allowed_border=-1, pos_weight=-1),
)
work_dir = "./work_dirs/reppoints_moment_r50_fpn_1x"
