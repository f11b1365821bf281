# IoU-aware RetinaNet R-101 with multi-scale test-time augmentation
# (BASELINE config 3: multi-scale TTA via MultiScaleFlipAug + merge_aug_bboxes)
_base_ = "iou_aware_retinanet_r101_fpn_1x.py"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="MultiScaleFlipAug",
         img_scale=[(1333, 800), (1666, 1000)],
         flip=True,
         transforms=[
             dict(type="Resize", keep_ratio=True),
             dict(type="RandomFlip", flip_ratio=0.0),  # driven by the wrapper
             dict(type="Normalize", **img_norm_cfg),
             dict(type="Pad", size_divisor=32, size=(1024, 1696)),
             dict(type="Collect", keys=["img"]),
         ]),
]
data = dict(test=dict(pipeline=test_pipeline))
work_dir = "./work_dirs/iou_aware_retinanet_r101_fpn_mstest"
