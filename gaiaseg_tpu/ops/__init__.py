from .masking import (active_count, apply_channel_mask, channel_mask,
                      depth_mask, tree_to_ints)
from .dynamic_layers import DynBatchNorm, DynConv2d, DynLayerNorm, DynLinear
from .blocks import DynBottleneck, DynConvModule

__all__ = [
    "channel_mask", "depth_mask", "apply_channel_mask", "active_count",
    "tree_to_ints", "DynConv2d", "DynLinear", "DynBatchNorm", "DynLayerNorm",
    "DynConvModule", "DynBottleneck",
]
