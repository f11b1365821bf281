from .resnet import ResNet, BasicBlock, Bottleneck
from .resnext import ResNeXt
from .ssd_vgg import SSDVGG
from .hrnet import HRNet

__all__ = ["ResNet", "BasicBlock", "Bottleneck", "ResNeXt", "SSDVGG", "HRNet"]
