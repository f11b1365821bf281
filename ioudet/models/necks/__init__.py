from .fpn import FPN
from .bfp import BFP
from .hrfpn import HRFPN

__all__ = ["FPN", "BFP", "HRFPN"]
