"""SegFormer MLP decode head (pairs with ElasticMixViT; stretch config).

Per-level linear projection to ``channels``, bilinear resize to the finest
level, concat, 1x1 fuse conv + BN + ReLU, classifier.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import DynConvModule
from ...ops.dynamic_layers import DynLinear
from ...ops.resize import resize_bilinear
from ...utils.registry import HEADS
from .base import BaseDecodeHead


@HEADS.register_module(name=["SegFormerHead", "SegformerHead"])
class SegFormerHead(BaseDecodeHead):
    in_index: tuple = (0, 1, 2, 3)
    input_transform: str = "multiple_select"

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        feats = self._transform_inputs(inputs)
        target = feats[0].shape[1:3]
        proj = []
        for i, f in enumerate(feats):
            y = DynLinear(self.channels, dtype=self.dtype,
                          name=f"mlp{i}")(f)
            proj.append(resize_bilinear(y, target, self.align_corners))
        feat = jnp.concatenate(proj, axis=-1)
        feat = DynConvModule(self.channels, 1, norm="bn", act="relu",
                             dtype=self.dtype, name="fuse")(feat, train=train)
        return self.cls_seg(feat, train=train)
