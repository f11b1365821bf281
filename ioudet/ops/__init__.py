from .nms import nms, soft_nms, matrix_nms, greedy_suppress

__all__ = ["nms", "soft_nms", "matrix_nms", "greedy_suppress"]
