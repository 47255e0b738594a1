"""Multi-level neck: single-scale ViT output -> 4-level pyramid.

Capability parity with the reference ``DynamicMultiLevelNeck``
(reference gaiaseg/models/necks/dynamic_multilevel_neck.py:14-84):
per-input 1x1 lateral DynamicConvModules, then per-scale bilinear resize
(``scale_factor in [0.5, 1, 2, 4]``) + 3x3 conv.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import DynConvModule
from ...ops.resize import resize
from ...utils.registry import NECKS


@NECKS.register_module(name=["DynamicMultiLevelNeck", "MultiLevelNeck"])
class DynamicMultiLevelNeck(nn.Module):
    out_channels: int = 512
    scales: Sequence[float] = (0.5, 1, 2, 4)
    in_channels: object = None  # config parity; inferred
    norm_cfg: object = None
    act_cfg: object = None
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        inputs = list(inputs)
        laterals = [
            DynConvModule(self.out_channels, 1, norm=None, act=None,
                          dtype=self.dtype, name=f"lateral{i}")(x, train=train)
            for i, x in enumerate(inputs)]
        if len(laterals) == 1:
            laterals = laterals * len(self.scales)
        outs = []
        for i, scale in enumerate(self.scales):
            y = resize(laterals[i], scale_factor=scale)
            y = DynConvModule(self.out_channels, 3, norm=None, act=None,
                              dtype=self.dtype, name=f"conv{i}")(y, train=train)
            outs.append(y)
        return tuple(outs)
