from .backbones import DynamicResNet
from .decode_heads import DynamicFCNHead, DynamicPSPHead, DynamicUPerHead
from .necks import DynamicMultiLevelNeck
from .segmentors import DynamicEncoderDecoder
from . import losses  # noqa: F401  (registers loss classes)
from .builder import (build_backbone, build_head, build_loss, build_neck,
                      build_segmentor)
from .arch_util import (ArchBounds, BoundsSwitch, backbone_max_arch,
                        canonical_arch, covering_bounds, cycle_dispatch,
                        encode_arch, exact_bounds, make_depth_bucketer,
                        model_max_arch, to_device_arch)

__all__ = [
    "DynamicResNet", "DynamicPSPHead", "DynamicFCNHead", "DynamicUPerHead",
    "DynamicMultiLevelNeck", "DynamicEncoderDecoder", "build_backbone",
    "build_head", "build_neck", "build_loss", "build_segmentor",
    "ArchBounds", "BoundsSwitch", "cycle_dispatch",
    "exact_bounds", "covering_bounds", "make_depth_bucketer",
    "backbone_max_arch", "model_max_arch", "canonical_arch", "encode_arch",
    "to_device_arch",
]
