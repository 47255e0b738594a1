"""FCN decode head (auxiliary head of the canonical supernet config).

Capability parity with the reference ``DynamicFCNHead``
(reference gaiaseg/models/decode_heads/dynamic_fcn_head.py:24-135):
``num_convs`` 3x3 DynamicConvModules, optional ``concat_input`` conv over
``[x, output]``, dropout + 1x1 classifier. The inplace-distillation branch of
the reference's ``forward_train`` (dynamic_fcn_head.py:161-226) is realized
by the distillation losses in models/losses (the segmentor wires teacher
logits through them).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import DynConvModule
from ...utils.registry import HEADS
from .base import BaseDecodeHead


@HEADS.register_module(name=["DynamicFCNHead", "FCNHead"])
class DynamicFCNHead(BaseDecodeHead):
    num_convs: int = 2
    kernel_size: int = 3
    concat_input: bool = True
    dilation: int = 1

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        x = self._transform_inputs(inputs)
        y = x
        if self.num_convs == 0:
            # identity head requires in_channels == channels in the reference
            feat = x
        else:
            for i in range(self.num_convs):
                y = DynConvModule(self.channels, self.kernel_size,
                                  dilation=self.dilation, norm="bn",
                                  act="relu", bn_groups=self.bn_groups,
                                  dtype=self.dtype,
                                  name=f"conv{i}")(y, train=train)
            feat = y
        if self.concat_input:
            feat = jnp.concatenate([x, y], axis=-1)
            # width-bounded backbone: x may arrive prefix-sliced; the conv
            # branch (static width) maps to the LAST kernel rows
            feat = DynConvModule(self.channels, self.kernel_size, norm="bn",
                                 act="relu", bn_groups=self.bn_groups,
                                 dtype=self.dtype,
                                 name="conv_cat")(feat, train=train,
                                                  in_tail=self.channels)
        return self.cls_seg(feat, train=train)
