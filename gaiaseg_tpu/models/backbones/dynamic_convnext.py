"""DynamicConvNeXt supernet backbone (masked widths/depths, NHWC).

Capability parity with the reference ``DynamicConvNeXt``
(reference gaiaseg/models/backbones/dynamic_convnext.py:36-344):
4x4/4 conv stem + LN, three LN + 2x2/2 downsample pairs, 4 stages of blocks
(depthwise 7x7 -> LN -> 4x pointwise expand -> GELU -> pointwise back ->
sliced layer-scale gamma -> DropPath residual), per-stage out-norms
``norm{i}``; ``manipulate_body`` fans per-stage {width, depth} to blocks and
also resizes stem/downsample convs (reference :313-329).

TPU redesign: NHWC throughout (the reference's NCHW<->NHWC permutes around
LN/linear vanish), widths/depths arrive as traced arrays -> masks; the
layer-scale slice ``gamma[:C]`` (reference :95) becomes a masked multiply.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.dynamic_layers import DynConv2d, DynLayerNorm, DynLinear
from ...ops.masking import channel_mask
from ...utils.registry import BACKBONES

Array = jnp.ndarray


def drop_path(x: Array, rate: float, rng, enabled: bool) -> Array:
    """Per-sample stochastic depth (reference models/utils/drop_path.py)."""
    if not enabled or rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask


class DynamicConvNeXtBlock(nn.Module):
    dim: int                       # MAX stage width
    dp_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, width: Array, *, train: bool = False,
                 active=None) -> Array:
        mask = channel_mask(width, self.dim, self.dtype)
        mask4 = channel_mask(width * 4, self.dim * 4, self.dtype)
        y = DynConv2d(self.dim, 7, 1, groups=self.dim, use_bias=True,
                      dtype=self.dtype, name="dwconv")(x, mask)
        y = DynLayerNorm(self.dim, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(y, mask)
        y = DynLinear(self.dim * 4, dtype=self.dtype, name="pwconv1")(y, mask4)
        y = nn.gelu(y)
        y = DynLinear(self.dim, dtype=self.dtype, name="pwconv2")(y, mask)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,), jnp.float32)
            y = y * (gamma.astype(self.dtype) * mask)
        if train and self.dp_rate > 0:
            y = drop_path(y, self.dp_rate, self.make_rng("dropout"), True)
        out = x + y
        if active is not None:
            out = jnp.where(active, out, x)
        return out


@BACKBONES.register_module()
class DynamicConvNeXt(nn.Module):
    dims: Sequence[int] = (96, 192, 384, 768)     # MAX per-stage widths
    depths: Sequence[int] = (3, 3, 9, 3)          # MAX per-stage depths
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    in_chans: int = 3
    dtype: Any = jnp.bfloat16

    search_space = ("body",)

    def max_arch(self) -> Dict[str, Any]:
        return {"body": {"width": list(self.dims),
                         "depth": list(self.depths)}}

    def out_channels(self):
        return tuple(self.dims[i] for i in self.out_indices)

    @nn.compact
    def __call__(self, x: Array, arch: Dict[str, Any], *,
                 train: bool = False):
        body = arch["body"]
        widths = jnp.asarray(body["width"], jnp.int32)
        depths = jnp.asarray(body["depth"], jnp.int32)

        total = sum(self.depths)
        dp_rates = [self.drop_path_rate * i / max(total - 1, 1)
                    for i in range(total)]

        mask0 = channel_mask(widths[0], self.dims[0], self.dtype)
        x = DynConv2d(self.dims[0], 4, 4, use_bias=True, padding=0,
                      dtype=self.dtype,
                      name="stem")(x, mask0)
        x = DynLayerNorm(self.dims[0], epsilon=1e-6, dtype=self.dtype,
                         name="stem_ln")(x, mask0)

        outs = []
        offset = 0
        for i in range(4):
            w = widths[i]
            for j in range(self.depths[i]):
                active = jnp.asarray(j, jnp.int32) < depths[i]
                x = DynamicConvNeXtBlock(
                    self.dims[i], dp_rates[offset + j],
                    self.layer_scale_init_value, dtype=self.dtype,
                    name=f"stage{i}_block{j}")(
                    x, w, train=train, active=active)
            offset += self.depths[i]
            if i in self.out_indices:
                mask_i = channel_mask(w, self.dims[i], self.dtype)
                outs.append(DynLayerNorm(self.dims[i], epsilon=1e-6,
                                         dtype=self.dtype,
                                         name=f"norm{i}")(x, mask_i))
            if i < 3:
                mask_i = channel_mask(w, self.dims[i], self.dtype)
                mask_n = channel_mask(widths[i + 1], self.dims[i + 1],
                                      self.dtype)
                x = DynLayerNorm(self.dims[i], epsilon=1e-6,
                                 dtype=self.dtype,
                                 name=f"ds{i + 1}_ln")(x, mask_i)
                x = DynConv2d(self.dims[i + 1], 2, 2, use_bias=True,
                              dtype=self.dtype,
                              name=f"ds{i + 1}_conv")(x, mask_n)
        return tuple(outs)
