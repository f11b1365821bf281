from .bbox_head import (BBoxHead, ConvFCBBoxHead, SharedFCBBoxHead,
                        bbox_target_single)
from .double_bbox_head import DoubleConvFCBBoxHead

__all__ = ["BBoxHead", "ConvFCBBoxHead", "SharedFCBBoxHead",
           "DoubleConvFCBBoxHead", "bbox_target_single"]
