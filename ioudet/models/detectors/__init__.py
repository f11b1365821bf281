from .single_stage import (SingleStageDetector, RetinaNet, IoUAwareRetinaNet,
                           FCOS, SSD)
from .two_stage import TwoStageDetector, FasterRCNN, RPN
from .mask_rcnn import MaskRCNN
from .mask_scoring_rcnn import MaskScoringRCNN
from .cascade_rcnn import CascadeRCNN

__all__ = ["SingleStageDetector", "RetinaNet", "IoUAwareRetinaNet", "FCOS",
           "SSD", "TwoStageDetector", "FasterRCNN", "RPN", "MaskRCNN",
           "MaskScoringRCNN", "CascadeRCNN"]
