from .fpn import FPN
from .bfp import BFP
from .hrfpn import HRFPN
from .neck_sequence import NeckSequence

__all__ = ["FPN", "BFP", "HRFPN", "NeckSequence"]
