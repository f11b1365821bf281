from .layers import (ConvModule, ConvWS, FrozenBatchNorm, Scale,
                     bias_init_with_prob, build_norm, conv_class,
                     resize_nearest)

__all__ = ["ConvModule", "ConvWS", "FrozenBatchNorm", "Scale",
           "bias_init_with_prob", "build_norm", "conv_class",
           "resize_nearest"]
