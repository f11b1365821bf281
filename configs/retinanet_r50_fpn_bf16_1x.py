# RetinaNet R-50-FPN mixed precision 1x (ref: configs/fp16/
# retinanet_r50_fpn_fp16_1x.py) — bf16 compute / fp32 state on TPU.
_base_ = "./retinanet_r50_fpn_1x.py"
model = dict(dtype="bfloat16")
work_dir = "./work_dirs/retinanet_r50_fpn_bf16_1x"
