from .anchor_head import AnchorHead, clip_boxes
from .retina_head import RetinaHead
from .iou_aware_retina_head import IoUAwareRetinaHead
from .rpn_head import RPNHead
from .fcos_head import FCOSHead
from .ssd_head import SSDHead
from .guided_anchor_head import (GuidedAnchorHead, GARetinaHead, GARPNHead,
                                 FeatureAdaption)
from .free_anchor_retina_head import FreeAnchorRetinaHead
from .reppoints_head import RepPointsHead
from .fovea_head import FoveaHead

__all__ = ["AnchorHead", "RetinaHead", "IoUAwareRetinaHead", "RPNHead",
           "FCOSHead", "SSDHead", "GuidedAnchorHead", "GARetinaHead",
           "GARPNHead", "FeatureAdaption", "FreeAnchorRetinaHead",
           "RepPointsHead", "FoveaHead", "clip_boxes"]
