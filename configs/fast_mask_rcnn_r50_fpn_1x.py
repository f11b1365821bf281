# Fast Mask R-CNN R-50-FPN 1x (ref: configs/fast_mask_rcnn_r50_fpn_1x.py) —
# precomputed proposals + FCN mask branch.
_base_ = "./fast_rcnn_r50_fpn_1x.py"
model = dict(
    type="FastMaskRCNN",
    mask_roi_extractor=dict(type="SingleRoIExtractor", out_channels=256,
                            featmap_strides=[4, 8, 16, 32],
                            roi_layer=dict(out_size=14, sample_num=2)),
    mask_head=dict(type="FCNMaskHead", num_convs=4, in_channels=256,
                   conv_out_channels=256, num_classes=81),
)
data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
canvas = (832, 1344)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadProposals", num_max_proposals=2000),
    dict(type="LoadAnnotations", with_bbox=True, with_mask=True),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=canvas),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels", "gt_valid",
                               "gt_masks", "proposals", "prop_valid"]),
]
data = dict(train=dict(pipeline=train_pipeline))
work_dir = "./work_dirs/fast_mask_rcnn_r50_fpn_1x"
