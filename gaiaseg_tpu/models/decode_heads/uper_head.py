"""UPerNet decode head for ViT/ConvNeXt supernets.

Capability parity with the reference ``DynamicUPerHead``
(reference gaiaseg/models/decode_heads/dynamic_uper_head.py:17-131):
PSP module on the top pyramid level, 1x1 FPN laterals + 3x3 FPN convs,
top-down bilinear-add, multi-scale concat + 3x3 fpn_bottleneck, classifier.
Uses ``input_transform='multiple_select'`` over all levels.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import DynConvModule
from ...ops.resize import resize_bilinear
from ...utils.registry import HEADS
from .base import BaseDecodeHead
from .psp_head import PPM


@HEADS.register_module(name=["DynamicUPerHead", "UPerHead"])
class DynamicUPerHead(BaseDecodeHead):
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: str = "multiple_select"

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        feats = self._transform_inputs(inputs)
        n_levels = len(feats)

        # PSP on the deepest level (dynamic_uper_head.py:32-47)
        top = feats[-1]
        psp_outs = [top] + PPM(self.pool_scales, self.channels,
                               self.align_corners, self.bn_groups,
                               self.dtype,
                               name="psp_modules")(top, train=train)
        # width-bounded backbone: top may arrive prefix-sliced, shifting
        # the concat layout (see DynamicPSPHead — pools map to tail rows)
        psp_feat = DynConvModule(self.channels, 3, norm="bn", act="relu",
                                 bn_groups=self.bn_groups,
                                 dtype=self.dtype, name="psp_bottleneck")(
            jnp.concatenate(psp_outs, axis=-1), train=train,
            in_tail=len(self.pool_scales) * self.channels)

        # laterals (1x1) for the shallower levels (:49-70)
        laterals = []
        for i in range(n_levels - 1):
            laterals.append(
                DynConvModule(self.channels, 1, norm="bn", act="relu",
                              bn_groups=self.bn_groups,
                              dtype=self.dtype, name=f"lateral{i}")(
                    feats[i], train=train))
        laterals.append(psp_feat)

        # top-down path: upsample + add (:104-112)
        for i in range(n_levels - 1, 0, -1):
            size = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], size, self.align_corners)

        # per-level 3x3 FPN convs (top level keeps the PSP feature)
        fpn_outs = []
        for i in range(n_levels - 1):
            fpn_outs.append(
                DynConvModule(self.channels, 3, norm="bn", act="relu",
                              bn_groups=self.bn_groups,
                              dtype=self.dtype, name=f"fpn_conv{i}")(
                    laterals[i], train=train))
        fpn_outs.append(laterals[-1])

        # multi-scale concat at the finest resolution (:114-131)
        size = fpn_outs[0].shape[1:3]
        fpn_outs = [resize_bilinear(f, size, self.align_corners)
                    for f in fpn_outs]
        feat = DynConvModule(self.channels, 3, norm="bn", act="relu",
                             bn_groups=self.bn_groups,
                             dtype=self.dtype, name="fpn_bottleneck")(
            jnp.concatenate(fpn_outs, axis=-1), train=train)
        return self.cls_seg(feat, train=train)
