# Faster R-CNN R-50-C4 (caffe) 1x (ref: configs/faster_rcnn_r50_caffe_c4_1x
# .py): no FPN — RPN and RoI extraction on the stride-16 C4 map, shared
# res5 (ResLayer) trunk over pooled 14x14 RoI features, avg-pooled BBoxHead.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(
    backbone=dict(num_stages=3, out_indices=(2,), style="caffe",
                  strides=(1, 2, 2)),
    neck=None,
    shared_head=dict(type="ResLayer", depth=50, stage=3, stride=2,
                     style="caffe"),
    rpn_head=dict(in_channels=1024, feat_channels=1024,
                  anchor_scales=[2, 4, 8, 16, 32], anchor_strides=[16]),
    bbox_roi_extractor=dict(out_channels=1024, featmap_strides=[16],
                            roi_layer=dict(out_size=14, sample_num=2)),
    bbox_head=dict(_delete_=True, type="BBoxHead", with_avg_pool=True,
                   roi_feat_size=7, in_channels=2048, num_classes=81,
                   target_means=[0.0, 0.0, 0.0, 0.0],
                   target_stds=[0.1, 0.1, 0.2, 0.2]),
)
train_cfg = dict(
    rpn_proposal=dict(nms_pre=12000, max_num=2000, nms_thr=0.7),
    rcnn=dict(sampler=dict(num=512, pos_fraction=0.25)),
)
test_cfg = dict(rpn=dict(nms_pre=6000, max_num=1000, nms_thr=0.7))
work_dir = "./work_dirs/faster_rcnn_r50_caffe_c4_1x"
