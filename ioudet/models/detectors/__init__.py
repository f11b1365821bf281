from .single_stage import SingleStageDetector, RetinaNet, IoUAwareRetinaNet

__all__ = ["SingleStageDetector", "RetinaNet", "IoUAwareRetinaNet"]
