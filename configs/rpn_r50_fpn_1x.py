# RPN proposal-only model (ref: configs/rpn_r50_fpn_1x.py); evaluate with
# proposal recall (eval_recalls / CocoDistEvalRecallHook analog).
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(
    type="RPN",
    bbox_roi_extractor=None,
    bbox_head=None,
)
test_cfg = dict(nms_pre=2000, max_num=2000, nms_thr=0.7)
work_dir = "./work_dirs/rpn_r50_fpn_1x"
