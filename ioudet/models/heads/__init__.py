from .anchor_head import AnchorHead, clip_boxes
from .retina_head import RetinaHead
from .iou_aware_retina_head import IoUAwareRetinaHead
from .rpn_head import RPNHead

__all__ = ["AnchorHead", "RetinaHead", "IoUAwareRetinaHead", "RPNHead",
           "clip_boxes"]
