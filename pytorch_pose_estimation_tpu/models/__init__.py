from .layers import ConvBn, ConvBnAct, ConvBnRelu, DeconvBnRelu
from .darknet import Darknet19, darknet19
from .sbp import SBP
from .spm import SPM

__all__ = [
    "ConvBn",
    "ConvBnAct",
    "ConvBnRelu",
    "DeconvBnRelu",
    "Darknet19",
    "darknet19",
    "SBP",
    "SPM",
]
