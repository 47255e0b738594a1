"""PSP decode head: pyramid pooling over masked supernet features.

Capability parity with the reference ``DynamicPSPHead``
(reference gaiaseg/models/decode_heads/dynamic_psp_head.py:25-147):
per-scale AdaptiveAvgPool2d + 1x1 DynamicConvModule resized back and
concatenated with the input, a 3x3 bottleneck over
``in_channels + len(scales)*channels``, then dropout + 1x1 classifier.

The reference needs a ``channel_record`` hack to slice the concat whose
first segment has elastic width (psp_head.py:235-239); masking makes every
segment shape-static so plain concat is exact (SURVEY.md §7 hard-part (d)).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import DynConvModule
from ...ops.resize import adaptive_avg_pool2d, resize_bilinear
from ...utils.registry import HEADS
from .base import BaseDecodeHead

Array = jnp.ndarray


class PPM(nn.Module):
    """Pyramid pooling module (reference dynamic_psp_head.py:25-73)."""

    pool_scales: Sequence[int]
    channels: int
    align_corners: bool = False
    bn_groups: int = 1
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False):
        outs = []
        size = x.shape[1:3]
        for scale in self.pool_scales:
            y = adaptive_avg_pool2d(x, scale)
            y = DynConvModule(self.channels, 1, norm="bn", act="relu",
                              bn_groups=self.bn_groups, dtype=self.dtype,
                              name=f"pool{scale}")(
                y, train=train)
            outs.append(resize_bilinear(y, size, self.align_corners))
        return outs


@HEADS.register_module(name=["DynamicPSPHead", "PSPHead"])
class DynamicPSPHead(BaseDecodeHead):
    pool_scales: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, inputs, *, train: bool = False) -> Array:
        x = self._transform_inputs(inputs)
        psp_outs = [x] + PPM(self.pool_scales, self.channels,
                             self.align_corners, self.bn_groups, self.dtype,
                             name="psp_modules")(x, train=train)
        feat = jnp.concatenate(psp_outs, axis=-1)
        # width-bounded backbone: x may arrive prefix-sliced, shifting the
        # concat layout — the pool branches (static widths) map to the LAST
        # kernel rows (the executed analog of the reference's
        # channel_record concat slicing, reference psp_head.py:235-239)
        feat = DynConvModule(self.channels, 3, norm="bn", act="relu",
                             bn_groups=self.bn_groups, dtype=self.dtype,
                             name="bottleneck")(
            feat, train=train,
            in_tail=len(self.pool_scales) * self.channels)
        return self.cls_seg(feat, train=train)
