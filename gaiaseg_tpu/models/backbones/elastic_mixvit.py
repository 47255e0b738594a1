"""ElasticMixViT: SegFormer-style hierarchical transformer supernet.

The BASELINE.json stretch config ("transformer (SegFormer-style) supernet").
Not present in the reference — new capability, built from the same masked
primitives: 4 stages of overlapping patch embeds + blocks of
spatial-reduction attention (keys/values pooled by a strided conv) and
MixFFN (fc -> 3x3 depthwise conv -> GELU -> fc), all widths/depths/heads
traced-elastic. Pairs with ``SegFormerHead``.

Arch meta layout:
``{'body': {'width': [4], 'depth': [4], 'num_heads': [4],
            'ffn_ratio10': [4]}}``  (ffn_ratio10 = ratio*10 ints, matching
the reference Conformer's ffc convention).
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

HEAD_DIM = 32


class SRAttention(nn.Module):
    """Efficient self-attention with spatial reduction of K/V."""

    dim: int               # MAX stage width
    max_heads: int
    sr_ratio: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, num_heads: Array, dim_mask: Array, *,
                 train: bool = False) -> Array:
        b, h, w, _ = x.shape
        inner = self.max_heads * HEAD_DIM
        head_mask = channel_mask(num_heads * HEAD_DIM, inner, self.dtype)
        q = DynLinear(inner, dtype=self.dtype, name="q")(
            x.reshape(b, h * w, self.dim), head_mask)
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = DynConv2d(self.dim, self.sr_ratio, self.sr_ratio,
                              padding=0,
                              use_bias=True, dtype=self.dtype,
                              name="sr")(x, dim_mask)
            kv_in = DynLayerNorm(self.dim, dtype=self.dtype,
                                 name="sr_norm")(kv_in, dim_mask)
        kh, kw = kv_in.shape[1], kv_in.shape[2]
        kv_seq = kv_in.reshape(b, kh * kw, self.dim)
        k = DynLinear(inner, dtype=self.dtype, name="k")(kv_seq, head_mask)
        v = DynLinear(inner, dtype=self.dtype, name="v")(kv_seq, head_mask)

        q = q.reshape(b, h * w, self.max_heads, HEAD_DIM)
        k = k.reshape(b, kh * kw, self.max_heads, HEAD_DIM)
        v = v.reshape(b, kh * kw, self.max_heads, HEAD_DIM)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(HEAD_DIM, jnp.float32)).astype(self.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(b, h * w, inner) * head_mask
        out = DynLinear(self.dim, dtype=self.dtype, name="proj")(
            out, dim_mask)
        return out.reshape(b, h, w, self.dim)


class MixFFN(nn.Module):
    dim: int
    max_ffn: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, ffn_channels: Array, dim_mask: Array, *,
                 train: bool = False) -> Array:
        ffn_mask = channel_mask(ffn_channels, self.max_ffn, self.dtype)
        y = DynLinear(self.max_ffn, dtype=self.dtype, name="fc1")(x, ffn_mask)
        y = DynConv2d(self.max_ffn, 3, 1, groups=self.max_ffn, use_bias=True,
                      dtype=self.dtype, name="dwconv")(y, ffn_mask)
        y = nn.gelu(y)
        return DynLinear(self.dim, dtype=self.dtype, name="fc2")(y, dim_mask)


class MixViTBlock(nn.Module):
    dim: int
    max_heads: int
    max_ffn: int
    sr_ratio: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, num_heads: Array, ffn_channels: Array,
                 dim_mask: Array, *, train: bool = False,
                 active=None) -> Array:
        y = DynLayerNorm(self.dim, dtype=self.dtype, name="norm1")(x, dim_mask)
        y = SRAttention(self.dim, self.max_heads, self.sr_ratio,
                        dtype=self.dtype, name="attn")(
            y, num_heads, dim_mask, train=train)
        x1 = x + y
        z = DynLayerNorm(self.dim, dtype=self.dtype, name="norm2")(
            x1, dim_mask)
        z = MixFFN(self.dim, self.max_ffn, dtype=self.dtype, name="ffn")(
            z, ffn_channels, dim_mask, train=train)
        out = x1 + z
        if active is not None:
            out = jnp.where(active, out, x)
        return out


@BACKBONES.register_module(name=["ElasticMixViT", "ElasticSegFormer"])
class ElasticMixViT(nn.Module):
    widths: Sequence[int] = (64, 128, 320, 512)     # MAX per-stage widths
    depths: Sequence[int] = (3, 4, 6, 3)            # MAX per-stage depths
    num_heads: Sequence[int] = (2, 4, 10, 16)       # MAX heads (x32 dim)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    ffn_ratio10: int = 40                           # MAX ffn ratio * 10
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.bfloat16

    search_space = ("body",)

    def max_arch(self) -> Dict[str, Any]:
        return {"body": {
            "width": list(self.widths),
            "depth": list(self.depths),
            "num_heads": list(self.num_heads),
            "ffn_ratio10": [self.ffn_ratio10] * 4,
        }}

    def out_channels(self):
        return tuple(self.widths[i] for i in self.out_indices)

    @nn.compact
    def __call__(self, x: Array, arch: Dict[str, Any], *,
                 train: bool = False):
        body = arch["body"]
        widths = jnp.asarray(body["width"], jnp.int32)
        depths = jnp.asarray(body["depth"], jnp.int32)
        heads = jnp.asarray(body["num_heads"], jnp.int32)
        ratios = jnp.asarray(body["ffn_ratio10"], jnp.int32)

        outs = []
        for si in range(4):
            dim = self.widths[si]
            dim_mask = channel_mask(widths[si], dim, self.dtype)
            patch_k = 7 if si == 0 else 3
            patch_s = 4 if si == 0 else 2
            x = DynConv2d(dim, patch_k, patch_s, use_bias=True,
                          dtype=self.dtype, name=f"patch{si}")(x, dim_mask)
            x = DynLayerNorm(dim, dtype=self.dtype,
                             name=f"patch_norm{si}")(x, dim_mask)
            max_ffn = self.ffn_ratio10 * dim // 10
            ffn_ch = ratios[si] * widths[si] // 10
            for bi in range(self.depths[si]):
                active = jnp.asarray(bi, jnp.int32) < depths[si]
                x = MixViTBlock(dim, self.num_heads[si], max_ffn,
                                self.sr_ratios[si], dtype=self.dtype,
                                name=f"stage{si}_block{bi}")(
                    x, heads[si], ffn_ch, dim_mask, train=train,
                    active=active)
            x = DynLayerNorm(dim, dtype=self.dtype,
                             name=f"out_norm{si}")(x, dim_mask)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)
