"""Decode-head base: input transforms + classifier, mmseg-contract parity.

Re-creates the behavior of the reference's ``DynamicBaseDecodeHead``
(reference gaiaseg/models/decode_heads/dynamic_decode_head.py:77-239):
``input_transform in {resize_concat, multiple_select, None}`` with
``in_index`` selection, dropout + 1x1 ``conv_seg`` classifier. Loss
computation (logit resize to label size + CE + accuracy,
dynamic_decode_head.py:219-239) lives in the segmentor, keeping heads pure
feature->logit functions.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops.dynamic_layers import DynConv2d
from ...ops.resize import resize_bilinear

Array = jnp.ndarray


class BaseDecodeHead(nn.Module):
    """Shared fields/utilities for all decode heads."""

    num_classes: int = 19
    channels: int = 512
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None  # None|'resize_concat'|'multiple_select'
    dropout_ratio: float = 0.1
    align_corners: bool = False
    dtype: Any = jnp.bfloat16
    # accepted for config parity; channel widths are inferred from inputs
    in_channels: Any = None
    loss_decode: Any = None
    sampler: Any = None
    norm_cfg: Any = None
    conv_cfg: Any = None
    bn_groups: int = 1   # BN stat groups (norm_cfg stat_groups plumbing)
    act_cfg: Any = None
    ignore_index: int = 255

    def _transform_inputs(self, inputs):
        if self.input_transform == "resize_concat":
            idxs = self.in_index if isinstance(self.in_index, (list, tuple)) \
                else [self.in_index]
            feats = [inputs[i] for i in idxs]
            target = feats[0].shape[1:3]
            feats = [resize_bilinear(f, target, self.align_corners)
                     for f in feats]
            # width-bounded backbone: pad prefix-sliced feats back to their
            # declared channels so the concat layout matches MAX kernels
            # (inactive lanes are zero, so padding is exact)
            if isinstance(self.in_channels, (list, tuple)) and \
                    len(self.in_channels) == len(feats):
                feats = [
                    f if f.shape[-1] >= int(c) else
                    jnp.pad(f, [(0, 0)] * (f.ndim - 1)
                            + [(0, int(c) - f.shape[-1])])
                    for f, c in zip(feats, self.in_channels)]
            return jnp.concatenate(feats, axis=-1)
        if self.input_transform == "multiple_select":
            return [inputs[i] for i in self.in_index]
        if isinstance(inputs, (list, tuple)):
            return inputs[self.in_index]
        return inputs

    def cls_seg(self, feat: Array, *, train: bool = False) -> Array:
        if self.dropout_ratio > 0:
            feat = nn.Dropout(self.dropout_ratio, deterministic=not train,
                              name="dropout")(feat)
        # conv_seg is a DynamicConv2d in the reference
        # (dynamic_decode_head.py:77) so extracted subnets can remap label
        # spaces; widths here are static.
        logit = DynConv2d(self.num_classes, 1, use_bias=True,
                          dtype=self.dtype, name="conv_seg")(feat)
        return logit
