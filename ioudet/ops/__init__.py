from .nms import (nms, soft_nms, matrix_nms, greedy_suppress,
                  greedy_suppress_sequential)
from .roi_align import roi_align, roi_pool
from .masked_conv import masked_conv2d
from .deform_conv import deform_conv2d
from .preprocess import preprocess, preprocess_batch

__all__ = ["nms", "soft_nms", "matrix_nms", "greedy_suppress",
           "greedy_suppress_sequential", "roi_align", "roi_pool",
           "masked_conv2d", "deform_conv2d", "preprocess", "preprocess_batch"]
