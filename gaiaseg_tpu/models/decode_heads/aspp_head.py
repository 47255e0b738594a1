"""ASPP / DeepLabV3+ decode heads (BASELINE.json config 2).

ASPPHead: 1x1 + dilated 3x3 branches (rates 12/24/36) + global-pool branch,
concat + 3x3 bottleneck + classifier. DepthwiseSeparableASPPHead
(DeepLabV3+): separable ASPP branches plus a low-level (c1) skip projected
and fused with two separable 3x3 convs at 1/4 resolution.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import DynConvModule
from ...ops.dynamic_layers import DynBatchNorm, DynConv2d
from ...ops.resize import resize_bilinear
from ...utils.registry import HEADS
from .base import BaseDecodeHead

Array = jnp.ndarray


class SepConvModule(nn.Module):
    """depthwise 3x3 (+BN+ReLU) -> pointwise 1x1 (+BN+ReLU)."""

    features: int
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        cin = x.shape[-1]
        y = DynConv2d(cin, 3, 1, dilation=self.dilation, groups=cin,
                      dtype=self.dtype, name="dw")(x)
        y = DynBatchNorm(cin, dtype=self.dtype, name="dw_bn")(
            y, use_running_average=not train)
        y = nn.relu(y)
        y = DynConvModule(self.features, 1, norm="bn", act="relu",
                          dtype=self.dtype, name="pw")(y, train=train)
        return y


class ASPPModule(nn.Module):
    dilations: Sequence[int]
    channels: int
    separable: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False):
        outs = []
        for i, d in enumerate(self.dilations):
            if d == 1:
                outs.append(DynConvModule(
                    self.channels, 1, norm="bn", act="relu",
                    dtype=self.dtype, name=f"branch{i}")(x, train=train))
            elif self.separable:
                outs.append(SepConvModule(self.channels, d,
                                          dtype=self.dtype,
                                          name=f"branch{i}")(x, train=train))
            else:
                outs.append(DynConvModule(
                    self.channels, 3, dilation=d, norm="bn", act="relu",
                    dtype=self.dtype, name=f"branch{i}")(x, train=train))
        return outs


@HEADS.register_module(name=["DynamicASPPHead", "ASPPHead"])
class DynamicASPPHead(BaseDecodeHead):
    dilations: Sequence[int] = (1, 12, 24, 36)

    separable: bool = False

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        x = self._transform_inputs(inputs)
        size = x.shape[1:3]
        # global-pool branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = DynConvModule(self.channels, 1, norm="bn", act="relu",
                               dtype=self.dtype, name="image_pool")(
            pooled, train=train)
        pooled = resize_bilinear(pooled, size, self.align_corners)
        branches = [pooled] + ASPPModule(
            tuple(self.dilations), self.channels, self.separable,
            dtype=self.dtype, name="aspp")(x, train=train)
        feat = jnp.concatenate(branches, axis=-1)
        feat = DynConvModule(self.channels, 3, norm="bn", act="relu",
                             dtype=self.dtype, name="bottleneck")(
            feat, train=train)
        return self.cls_seg(feat, train=train)


@HEADS.register_module(name=["DepthwiseSeparableASPPHead",
                             "DynamicSepASPPHead"])
class DepthwiseSeparableASPPHead(BaseDecodeHead):
    """DeepLabV3+: separable ASPP + c1 low-level fusion."""

    dilations: Sequence[int] = (1, 12, 24, 36)
    c1_in_index: int = 0
    c1_channels: int = 48

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        x = inputs[self.in_index] if isinstance(inputs, (list, tuple)) \
            else inputs
        size = x.shape[1:3]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = DynConvModule(self.channels, 1, norm="bn", act="relu",
                               dtype=self.dtype, name="image_pool")(
            pooled, train=train)
        pooled = resize_bilinear(pooled, size, self.align_corners)
        branches = [pooled] + ASPPModule(
            tuple(self.dilations), self.channels, separable=True,
            dtype=self.dtype, name="aspp")(x, train=train)
        feat = jnp.concatenate(branches, axis=-1)
        feat = DynConvModule(self.channels, 3, norm="bn", act="relu",
                             dtype=self.dtype, name="bottleneck")(
            feat, train=train)

        c1 = inputs[self.c1_in_index]
        c1 = DynConvModule(self.c1_channels, 1, norm="bn", act="relu",
                           dtype=self.dtype, name="c1_proj")(c1, train=train)
        feat = resize_bilinear(feat, c1.shape[1:3], self.align_corners)
        feat = jnp.concatenate([feat, c1], axis=-1)
        feat = SepConvModule(self.channels, dtype=self.dtype,
                             name="fuse1")(feat, train=train)
        feat = SepConvModule(self.channels, dtype=self.dtype,
                             name="fuse2")(feat, train=train)
        return self.cls_seg(feat, train=train)
