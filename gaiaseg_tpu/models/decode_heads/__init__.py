from .base import BaseDecodeHead
from .fcn_head import DynamicFCNHead
from .psp_head import PPM, DynamicPSPHead
from .uper_head import DynamicUPerHead

__all__ = ["BaseDecodeHead", "DynamicFCNHead", "DynamicPSPHead", "PPM",
           "DynamicUPerHead"]
