# Mask R-CNN R-50-FPN on Cityscapes (ref: configs/cityscapes/
# mask_rcnn_r50_fpn_1x_cityscapes.py) — 8 instance classes.
_base_ = "./faster_rcnn_r50_fpn_1x_cityscapes.py"
model = dict(
    type="MaskRCNN",
    mask_roi_extractor=dict(type="SingleRoIExtractor", out_channels=256,
                            featmap_strides=[4, 8, 16, 32],
                            roi_layer=dict(out_size=14, sample_num=2)),
    mask_head=dict(type="FCNMaskHead", num_convs=4, in_channels=256,
                   conv_out_channels=256, num_classes=9),
)
train_cfg = dict(rcnn=dict(mask_size=28))
work_dir = "./work_dirs/mask_rcnn_r50_fpn_1x_cityscapes"
