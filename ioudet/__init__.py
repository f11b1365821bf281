"""ioudet — a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

A from-scratch rebuild of the capabilities of
ShengkaiWu/IoU-aware-single-stage-object-detector (an mmdetection-v1-era
PyTorch/CUDA framework implementing "IoU-aware Single-stage Object Detector
for Accurate Localization", arXiv:1912.05992), redesigned TPU-first:

  * fixed-shape, fully jitted compute path (no host round-trips in the hot
    loop; masks instead of nonzero/gather);
  * pure-XLA fused losses instead of CUDA kernels;
  * one batched greedy/matrix NMS instead of per-class CUDA NMS;
  * GSPMD data parallelism via ``jax.sharding`` instead of DDP/NCCL.
"""

from .version import __version__
from .utils import Config, ConfigDict, Registry, build_from_cfg

__all__ = ["__version__", "Config", "ConfigDict", "Registry", "build_from_cfg"]
