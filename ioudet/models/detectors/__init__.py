from .single_stage import (SingleStageDetector, RetinaNet, IoUAwareRetinaNet,
                           FCOS, SSD)
from .two_stage import (TwoStageDetector, FasterRCNN, DoubleHeadRCNN, RPN,
                        sample_rois_batch)
from .fast_rcnn import FastRCNN, FastMaskRCNN
from .mask_rcnn import MaskRCNN
from .mask_scoring_rcnn import MaskScoringRCNN
from .cascade_rcnn import CascadeRCNN
from .grid_rcnn import GridRCNN
from .htc import HybridTaskCascade

__all__ = ["SingleStageDetector", "RetinaNet", "IoUAwareRetinaNet", "FCOS",
           "SSD", "TwoStageDetector", "FasterRCNN", "DoubleHeadRCNN", "RPN",
           "FastRCNN", "FastMaskRCNN", "MaskRCNN",
           "MaskScoringRCNN", "CascadeRCNN", "GridRCNN", "HybridTaskCascade"]
