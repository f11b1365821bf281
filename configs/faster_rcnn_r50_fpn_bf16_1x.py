# Faster R-CNN R-50-FPN mixed precision 1x (ref: configs/fp16/
# faster_rcnn_r50_fpn_fp16_1x.py).  The reference's loss-scaled fp16 maps
# to bf16 compute with fp32 params/optimizer on TPU — no loss scaling
# needed (see SURVEY 2.5); `dtype` threads the policy through every module.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(dtype="bfloat16")
work_dir = "./work_dirs/faster_rcnn_r50_fpn_bf16_1x"
