from .base import BaseDecodeHead
from .fcn_head import DynamicFCNHead
from .psp_head import PPM, DynamicPSPHead
from .uper_head import DynamicUPerHead
from .segformer_head import SegFormerHead
from .aspp_head import DepthwiseSeparableASPPHead, DynamicASPPHead

__all__ = ["BaseDecodeHead", "DynamicFCNHead", "DynamicPSPHead", "PPM",
           "DynamicUPerHead", "SegFormerHead", "DynamicASPPHead",
           "DepthwiseSeparableASPPHead"]
