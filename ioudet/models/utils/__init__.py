from .layers import (ConvModule, FrozenBatchNorm, Scale, bias_init_with_prob,
                     build_norm, resize_nearest)

__all__ = ["ConvModule", "FrozenBatchNorm", "Scale", "bias_init_with_prob",
           "build_norm", "resize_nearest"]
