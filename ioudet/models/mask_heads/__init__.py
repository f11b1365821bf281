from .fcn_mask_head import FCNMaskHead, HTCMaskHead
from .maskiou_head import MaskIoUHead
from .grid_head import GridHead
from .fused_semantic_head import FusedSemanticHead

__all__ = ["FCNMaskHead", "HTCMaskHead", "MaskIoUHead", "GridHead",
           "FusedSemanticHead"]
