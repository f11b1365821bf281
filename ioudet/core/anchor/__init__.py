from .anchor_generator import AnchorGenerator
from .anchor_target import (AnchorTargets, anchor_target, anchor_target_single,
                            anchor_inside_flags, images_to_levels)

__all__ = ["AnchorGenerator", "AnchorTargets", "anchor_target",
           "anchor_target_single", "anchor_inside_flags", "images_to_levels"]
