# Hybrid Task Cascade R-50-FPN 1x (ref capability: configs/htc/
# htc_r50_fpn_1x.py): 3-stage cascade with interleaved box/mask execution,
# mask information flow, and a fused semantic branch.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(
    type="HybridTaskCascade",
    num_stages=3,
    interleaved=True,
    mask_info_flow=True,
    stage_loss_weights=[1.0, 0.5, 0.25],
    stage_pos_thrs=[0.5, 0.6, 0.7],
    bbox_head=[
        dict(type="SharedFCBBoxHead", num_classes=81, in_channels=256,
             roi_feat_size=7, fc_out_channels=1024,
             target_means=[0.0, 0.0, 0.0, 0.0],
             target_stds=[0.1, 0.1, 0.2, 0.2]),
        dict(type="SharedFCBBoxHead", num_classes=81, in_channels=256,
             roi_feat_size=7, fc_out_channels=1024,
             target_means=[0.0, 0.0, 0.0, 0.0],
             target_stds=[0.05, 0.05, 0.1, 0.1]),
        dict(type="SharedFCBBoxHead", num_classes=81, in_channels=256,
             roi_feat_size=7, fc_out_channels=1024,
             target_means=[0.0, 0.0, 0.0, 0.0],
             target_stds=[0.033, 0.033, 0.067, 0.067]),
    ],
    mask_roi_extractor=dict(type="SingleRoIExtractor", out_channels=256,
                            featmap_strides=[4, 8, 16, 32],
                            roi_layer=dict(out_size=14, sample_num=2)),
    mask_head=[
        dict(type="HTCMaskHead", num_convs=4, in_channels=256,
             conv_out_channels=256, num_classes=81),
        dict(type="HTCMaskHead", num_convs=4, in_channels=256,
             conv_out_channels=256, num_classes=81),
        dict(type="HTCMaskHead", num_convs=4, in_channels=256,
             conv_out_channels=256, num_classes=81),
    ],
    semantic_roi_extractor=dict(type="SingleRoIExtractor", out_channels=256,
                                featmap_strides=[8],
                                roi_layer=dict(out_size=14, sample_num=2)),
    semantic_head=dict(type="FusedSemanticHead", num_ins=5, fusion_level=1,
                       num_convs=4, in_channels=256, conv_out_channels=256,
                       num_classes=183, loss_weight=0.2),
)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_mask=True,
         with_seg=True),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=(832, 1344)),
    dict(type="SegRescale", scale_factor=0.125),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_valid", "gt_masks",
               "gt_semantic_seg"]),
]
data = dict(
    train=dict(pipeline=train_pipeline,
               seg_prefix="data/coco/stuffthingmaps/train2017/"),
)
work_dir = "./work_dirs/htc_r50_fpn_1x"
