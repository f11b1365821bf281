from .single_stage import (SingleStageDetector, RetinaNet, IoUAwareRetinaNet,
                           FCOS, SSD)
from .two_stage import TwoStageDetector, FasterRCNN, RPN

__all__ = ["SingleStageDetector", "RetinaNet", "IoUAwareRetinaNet", "FCOS",
           "SSD", "TwoStageDetector", "FasterRCNN", "RPN"]
