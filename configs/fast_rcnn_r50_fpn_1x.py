# Fast R-CNN R-50-FPN 1x (ref: configs/fast_rcnn_r50_fpn_1x.py) — the
# precomputed-proposal detector: no RPN, proposals come from the dataset's
# proposal_file via LoadProposals.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
# None deletes inherited components (builder drops None-valued keys)
model = dict(
    type="FastRCNN",
    rpn_head=None,
)
train_cfg = dict(
    rpn=None,
    rpn_proposal=None,
)
test_cfg = dict(rpn=None)
data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
canvas = (832, 1344)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadProposals", num_max_proposals=2000),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=canvas),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels", "gt_valid",
                               "proposals", "prop_valid"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadProposals", num_max_proposals=1000),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=canvas),
    dict(type="Collect", keys=["img", "proposals", "prop_valid"]),
]
data = dict(
    train=dict(proposal_file=data_root +
               "proposals/rpn_r50_fpn_1x_train2017.pkl",
               pipeline=train_pipeline),
    val=dict(proposal_file=data_root +
             "proposals/rpn_r50_fpn_1x_val2017.pkl",
             pipeline=test_pipeline),
    test=dict(proposal_file=data_root +
              "proposals/rpn_r50_fpn_1x_val2017.pkl",
              pipeline=test_pipeline),
)
work_dir = "./work_dirs/fast_rcnn_r50_fpn_1x"
