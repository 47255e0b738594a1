"""Composite masked blocks: DynConvModule and DynBottleneck.

Equivalents of gaiavision ``DynamicConvModule`` (conv+norm+act bundle used by
every decode head, reference dynamic_psp_head.py:20,53) and
``DynamicBottleneck`` (reference dynamic_res_layer.py:13,72, expansion=4).

The reference threads a ``channel_record`` through ConvModule so it can slice
a concatenated input whose segments have varying active widths
(reference psp_head.py:235-239). Masking makes concat widths static, so that
machinery collapses: each concat segment is already masked — a genuine
simplification called out in SURVEY.md §7 hard-part (d).
"""
from __future__ import annotations

from typing import Any, Optional, Union, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .dynamic_layers import DynBatchNorm, DynConv2d, DynLayerNorm
from .masking import channel_mask

Array = jnp.ndarray


def get_act(name: Optional[str]):
    if name in (None, "none"):
        return lambda x: x
    return {"relu": nn.relu, "gelu": nn.gelu, "silu": nn.silu,
            "sigmoid": nn.sigmoid}[name.lower()]


class DynConvModule(nn.Module):
    """conv -> norm -> act with traced output-width masking."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    norm: Optional[str] = "bn"           # 'bn' | 'ln' | None
    act: Optional[str] = "relu"
    use_bias: Optional[bool] = None      # default: bias iff no norm
    bn_groups: int = 1                   # BN stat groups (DynBatchNorm)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, out_mask: Optional[Array] = None, *,
                 train: bool = False,
                 update_gate: Optional[Array] = None,
                 in_tail: Optional[int] = None) -> Array:
        bias = self.use_bias if self.use_bias is not None else self.norm is None
        # when a masked norm follows, the conv-level mask is redundant (the
        # norm's folded scale/bias zeroes inactive lanes) — skip one
        # elementwise pass per conv
        conv_mask = out_mask if self.norm is None else None
        # the mask LENGTH is the static execution bound (see DynConv2d):
        # a shorter-than-MAX mask truncates the produced channels
        oslice = out_mask.shape[-1] if out_mask is not None else None
        y = DynConv2d(self.features, self.kernel_size, self.strides,
                      self.dilation, use_bias=bias, dtype=self.dtype,
                      name="conv")(x, conv_mask, out_slice=oslice,
                                   in_tail=in_tail)
        if self.norm == "bn":
            y = DynBatchNorm(self.features, dtype=self.dtype,
                             stat_groups=self.bn_groups, name="bn")(
                y, out_mask, use_running_average=not train,
                update_gate=update_gate)
        elif self.norm == "ln":
            y = DynLayerNorm(self.features, dtype=self.dtype, name="ln")(y, out_mask)
        return get_act(self.act)(y)


class DynBottleneck(nn.Module):
    """Masked ResNet bottleneck (1x1 -> 3x3 -> 1x1, expansion 4).

    ``width`` is the traced active mid-width ("planes"); the output width is
    ``4*width`` via ``out_mask``. ``active`` is the traced depth flag: an
    inactive block passes its input through untouched AND freezes its BN
    running stats — matching the reference where blocks beyond
    ``depth_state`` simply do not run (dynamic_res_layer.py:170-172).
    """

    planes: int                 # MAX mid width
    expansion: int = 4
    strides: int = 1
    dilation: int = 1
    has_downsample: bool = False
    avg_down: bool = False
    bn_groups: int = 1          # BN stat groups (DynBatchNorm)
    width_bound: int = 0        # STATIC mid-width execution bound; 0 = MAX.
                                # Convs/BN run on the first ``width_bound``
                                # lanes only (gaiavision slice semantics,
                                # reference dynamic_res_layer.py:154-157);
                                # traced ``width`` <= bound masks within it.
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, width: Array, out_mask: Array, *,
                 train: bool = False,
                 active: Optional[Array] = None) -> Array:
        wb = self.planes
        if self.width_bound and not self.is_initializing():
            wb = min(self.width_bound, self.planes)
        mid_mask = channel_mask(width, wb, self.dtype)
        gate = active if active is not None else None
        out_ch = self.planes * self.expansion
        ob = out_mask.shape[-1]     # static out bound (= wb*expansion)

        y = DynConv2d(self.planes, 1, 1, use_bias=False, dtype=self.dtype,
                      name="conv1")(x, out_slice=wb)  # bn1 masks
        y = DynBatchNorm(self.planes, dtype=self.dtype,
                         stat_groups=self.bn_groups, name="bn1")(
            y, mid_mask, use_running_average=not train, update_gate=gate)
        y = nn.relu(y)

        y = DynConv2d(self.planes, 3, self.strides, self.dilation,
                      use_bias=False, dtype=self.dtype, name="conv2")(
            y, out_slice=wb)
        y = DynBatchNorm(self.planes, dtype=self.dtype,
                         stat_groups=self.bn_groups, name="bn2")(
            y, mid_mask, use_running_average=not train, update_gate=gate)
        y = nn.relu(y)

        y = DynConv2d(out_ch, 1, 1, use_bias=False, dtype=self.dtype,
                      name="conv3")(y, out_slice=ob)
        y = DynBatchNorm(out_ch, dtype=self.dtype,
                         stat_groups=self.bn_groups, name="bn3")(
            y, out_mask, use_running_average=not train, update_gate=gate)

        if self.has_downsample:
            identity = x
            if self.avg_down and self.strides > 1:
                identity = nn.avg_pool(identity,
                                       (self.strides, self.strides),
                                       (self.strides, self.strides))
                ds_stride = 1
            else:
                ds_stride = self.strides
            identity = DynConv2d(out_ch, 1, ds_stride, use_bias=False,
                                 dtype=self.dtype, name="downsample_conv")(
                identity, out_slice=ob)
            identity = DynBatchNorm(out_ch, dtype=self.dtype,
                                    stat_groups=self.bn_groups,
                                    name="downsample_bn")(
                identity, out_mask, use_running_average=not train,
                update_gate=gate)
        else:
            identity = x

        out = nn.relu(y + identity)
        if active is not None:
            # depth-inactive block == not executed: output is the input
            out = jnp.where(active, out, identity)
        return out
