from .mask_target import (rasterize_polygons, crop_mask_to_roi, mask_target)
from . import rle

__all__ = ["rasterize_polygons", "crop_mask_to_roi", "mask_target", "rle"]
