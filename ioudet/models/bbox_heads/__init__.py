from .bbox_head import (BBoxHead, ConvFCBBoxHead, SharedFCBBoxHead,
                        bbox_target_single)

__all__ = ["BBoxHead", "ConvFCBBoxHead", "SharedFCBBoxHead",
           "bbox_target_single"]
