"""ElasticConvformer: dual-branch (CNN + transformer) supernet backbone.

Capability parity with the reference's largest backbone
(reference gaiaseg/models/backbones/elastic_convformer.py:702-993):
7x7/2 stem + maxpool, a first ConvTrans block that patchifies the CNN
feature into tokens + cls (:480-497, :571-578), two depth-elastic fusion
stages whose blocks run a CNN bottleneck, squeeze its mid-feature into
tokens (FCU down), fuse with the transformer branch, and expand tokens back
into the CNN branch (FCU up) (:566-586), then a final stride-2 fusion block
(:588-700 stage structure); outputs the 4 CNN-branch feature maps
(:945-975). BN branch is intended frozen in the reference
(``norm_eval=True``, :760) — kept as the default here.

Elastic dims (nested meta exactly as the reference's init_state :769-782):
``stem.width``; ``body.depth[3]``; ``body.block.convblock.width[3]``;
``body.block.embed_dim.width``; ``body.block.transblock.MHA.num_heads[3]``;
``body.block.transblock.FFN.feedforward_channels[3]`` (ratio*10 ints, e.g.
40 -> 4.0x embed, matching the reference's ffc/10 convention).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.dynamic_layers import DynBatchNorm, DynConv2d, DynLayerNorm, \
    DynLinear
from ...ops.masking import channel_mask
from ...ops.resize import resize_bilinear
from ...utils.registry import BACKBONES
from .elastic_transformer import ElasticMHA

Array = jnp.ndarray


class ElasticConvBlock(nn.Module):
    """Bottleneck of the CNN branch; returns (out, mid_feature)
    (reference Elastic_conv_Block :243-378; ``manipulate_width`` scales the
    two inner convs by width//4, :334-341)."""

    outplanes: int            # MAX out width
    strides: int = 1
    res_conv: bool = False
    norm_eval: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, width: Array,
                 x_t_r: Optional[Array] = None, *,
                 train: bool = False, active=None,
                 return_mid: bool = True):
        bn_train = train and not self.norm_eval
        med = self.outplanes // 4
        med_mask = channel_mask(width // 4, med, self.dtype)
        out_mask = channel_mask(width, self.outplanes, self.dtype)
        residual = x

        y = DynConv2d(med, 1, 1, dtype=self.dtype, name="conv1")(x)
        y = DynBatchNorm(med, dtype=self.dtype, name="bn1")(
            y, med_mask, use_running_average=not bn_train, update_gate=active)
        y = nn.relu(y)
        y = DynConv2d(med, 3, self.strides, dtype=self.dtype,
                      name="conv2")(y)
        y = DynBatchNorm(med, dtype=self.dtype, name="bn2")(
            y, med_mask, use_running_average=not bn_train, update_gate=active)
        mid = nn.relu(y)
        y = mid
        if x_t_r is not None:
            # FCU-up fusion: expanded transformer feature added to the mid
            # feature before conv3 (reference :566-586 fusion_block call)
            y = y + x_t_r
        y = DynConv2d(self.outplanes, 1, 1, dtype=self.dtype,
                      name="conv3")(y)
        y = DynBatchNorm(self.outplanes, dtype=self.dtype, name="bn3")(
            y, out_mask, use_running_average=not bn_train, update_gate=active)
        if self.res_conv:
            residual = DynConv2d(self.outplanes, 1, self.strides,
                                 dtype=self.dtype, name="conv_res")(x)
            residual = DynBatchNorm(self.outplanes, dtype=self.dtype,
                                    name="bn_res")(
                residual, out_mask, use_running_average=not bn_train,
                update_gate=active)
        out = nn.relu(y + residual)
        if return_mid:
            return out, mid
        return out


class ElasticTransBlock(nn.Module):
    """Pre-norm MHA + FFN on tokens (reference Elastic_trans_Block
    :185-241); heads are elastic at fixed head_dim=64, ffn width elastic."""

    embed_dim: int
    max_heads: int
    max_ffn: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, num_heads: Array, ffn_channels: Array,
                 embed_mask: Array, *, train: bool = False,
                 active=None) -> Array:
        y = DynLayerNorm(self.embed_dim, dtype=self.dtype, name="norm1")(
            x, embed_mask)
        y = ElasticMHA(self.embed_dim, self.max_heads, dtype=self.dtype,
                       name="attn")(y, num_heads, embed_mask, train=train)
        x1 = x + y
        z = DynLayerNorm(self.embed_dim, dtype=self.dtype, name="norm2")(
            x1, embed_mask)
        ffn_mask = channel_mask(ffn_channels, self.max_ffn, self.dtype)
        z = DynLinear(self.max_ffn, dtype=self.dtype, name="fc1")(z, ffn_mask)
        z = nn.gelu(z)
        z = DynLinear(self.embed_dim, dtype=self.dtype, name="fc2")(
            z, embed_mask)
        out = x1 + z
        if active is not None:
            out = jnp.where(active, out, x)
        return out


class FusionBlock(nn.Module):
    """One ConvTrans fusion step (reference Elastic_ConvTrans_Block
    :453-586, stage=False path): CNN bottleneck -> squeeze mid to tokens ->
    transformer -> expand tokens back -> fused bottleneck output."""

    outplanes: int
    embed_dim: int
    max_heads: int
    max_ffn: int
    dw_stride: int
    strides: int = 1
    res_conv: bool = False
    last_fusion: bool = False   # downsampling happens in the fusion block
    norm_eval: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, x_t: Array, width: Array, num_heads: Array,
                 ffn_channels: Array, embed_mask: Array, *,
                 train: bool = False, active=None):
        med = self.outplanes // 4
        med_mask = channel_mask(width // 4, med, self.dtype)
        x_in, x_t_in = x, x_t
        cnn_stride = 1 if self.last_fusion else self.strides
        fusion_stride = self.strides if self.last_fusion else 1

        out, mid = ElasticConvBlock(
            self.outplanes, cnn_stride, self.res_conv and not self.last_fusion,
            norm_eval=self.norm_eval, dtype=self.dtype, name="cnn_block")(
            x, width, train=train, active=active, return_mid=True)

        # FCU down: avg-pool patchify mid feature -> tokens + LN + GELU
        # (reference Elastic_conv2trans :380-415)
        b, h, w, _ = mid.shape
        tok = nn.avg_pool(mid, (self.dw_stride, self.dw_stride),
                          (self.dw_stride, self.dw_stride))
        tok = DynConv2d(self.embed_dim, 1, 1, use_bias=True,
                        dtype=self.dtype, name="squeeze_conv")(
            tok, embed_mask)
        gh, gw = tok.shape[1], tok.shape[2]
        tok = tok.reshape(b, gh * gw, self.embed_dim)
        tok = DynLayerNorm(self.embed_dim, dtype=self.dtype,
                           name="squeeze_ln")(tok, embed_mask)
        tok = nn.gelu(tok)
        tok = jnp.concatenate(
            [jnp.zeros_like(x_t[:, :1]), tok], axis=1)  # cls slot

        x_t_new = ElasticTransBlock(
            self.embed_dim, self.max_heads, self.max_ffn, dtype=self.dtype,
            name="trans_block")(tok + x_t, num_heads, ffn_channels,
                                embed_mask, train=train, active=active)

        # FCU up: tokens -> map -> 1x1 conv -> BN -> relu -> upsample
        # (reference Elastic_trans2conv :417-451)
        grid = x_t_new[:, 1:].reshape(b, gh, gw, self.embed_dim)
        up = DynConv2d(med, 1, 1, use_bias=True, dtype=self.dtype,
                       name="expand_conv")(grid, med_mask)
        up = DynBatchNorm(med, dtype=self.dtype, name="expand_bn")(
            up, med_mask, use_running_average=not (train and not
                                                   self.norm_eval),
            update_gate=active)
        up = nn.relu(up)
        # x_t_r joins the fusion block's mid feature (post its strided conv2)
        oh = out.shape[1] // fusion_stride
        ow = out.shape[2] // fusion_stride
        up = resize_bilinear(up, (oh, ow))

        fused = ElasticConvBlock(
            self.outplanes, fusion_stride,
            self.res_conv and self.last_fusion,
            norm_eval=self.norm_eval, dtype=self.dtype, name="fusion_block")(
            out, width, x_t_r=up, train=train, active=active,
            return_mid=False)

        if active is not None and self.strides == 1 and not self.res_conv:
            fused = jnp.where(active, fused, x_in)
            x_t_new = jnp.where(active, x_t_new, x_t_in)
        return fused, x_t_new


@BACKBONES.register_module()
class ElasticConvformer(nn.Module):
    stem_width: int = 64
    body_width: Sequence[int] = (256, 512, 1024)    # MAX conv-branch widths
    body_depth: Sequence[int] = (4, 4, 4)           # MAX depths (3 stages)
    embed_dim: int = 576                            # MAX token width
    num_heads: int = 9                              # MAX heads
    mlp_ratio: int = 40                             # ratio*10 (reference ffc)
    patch_size: int = 16
    out_indices: Sequence[int] = (0, 1, 2, 3)
    norm_eval: bool = True
    dtype: Any = jnp.bfloat16

    search_space = ("stem", "body")

    @property
    def max_ffn(self) -> int:
        return self.mlp_ratio * self.embed_dim // 10

    def max_arch(self) -> Dict[str, Any]:
        return {
            "stem": {"width": self.stem_width},
            "body": {
                "depth": list(self.body_depth),
                "block": {
                    "convblock": {"width": list(self.body_width)},
                    "embed_dim": {"width": self.embed_dim},
                    "transblock": {
                        "MHA": {"num_heads": [self.num_heads] * 3},
                        "FFN": {"feedforward_channels":
                                [self.mlp_ratio] * 3},
                    },
                },
            },
        }

    def out_channels(self):
        chans = list(self.body_width) + [self.body_width[-1]]
        return tuple(chans[i] for i in self.out_indices)

    @nn.compact
    def __call__(self, x: Array, arch: Dict[str, Any], *,
                 train: bool = False):
        bn_train = train and not self.norm_eval
        stem_w = jnp.asarray(arch["stem"]["width"], jnp.int32)
        body = arch["body"]
        depths = jnp.asarray(body["depth"], jnp.int32)
        widths = jnp.asarray(body["block"]["convblock"]["width"], jnp.int32)
        emb = jnp.asarray(body["block"]["embed_dim"]["width"], jnp.int32)
        heads = jnp.asarray(
            body["block"]["transblock"]["MHA"]["num_heads"], jnp.int32)
        ffcs = jnp.asarray(
            body["block"]["transblock"]["FFN"]["feedforward_channels"],
            jnp.int32)
        embed_mask = channel_mask(emb, self.embed_dim, self.dtype)
        # ffc is ratio*10 -> absolute hidden width (reference :284-289)
        ffn_abs = ffcs * emb // 10

        # stem (reference :785-796)
        stem_mask = channel_mask(stem_w, self.stem_width, self.dtype)
        x = DynConv2d(self.stem_width, 7, 2, dtype=self.dtype,
                      name="conv1")(x, stem_mask)
        x = DynBatchNorm(self.stem_width, dtype=self.dtype, name="bn1")(
            x, stem_mask, use_running_average=not bn_train)
        x = nn.relu(x)
        x_base = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        dw = self.patch_size // 4
        b = x.shape[0]

        # conv_trans_1: first block patchifies tokens (reference :571-578)
        w0 = widths[0]
        out0_mask = channel_mask(w0, self.body_width[0], self.dtype)
        x, _ = ElasticConvBlock(self.body_width[0], 1, True,
                                norm_eval=self.norm_eval, dtype=self.dtype,
                                name="conv_1")(x_base, w0, train=train)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, self.embed_dim), jnp.float32)
        tok = DynConv2d(self.embed_dim, dw, dw, use_bias=True, padding=0,
                        dtype=self.dtype, name="trans_patch_conv")(
            x_base, embed_mask)
        gh, gw = tok.shape[1], tok.shape[2]
        tok = tok.reshape(b, gh * gw, self.embed_dim)
        x_t = jnp.concatenate(
            [jnp.tile(cls.astype(self.dtype) * embed_mask, (b, 1, 1)), tok],
            axis=1)
        x_t = ElasticTransBlock(self.embed_dim, self.num_heads, self.max_ffn,
                                dtype=self.dtype, name="trans_1")(
            x_t, heads[0], ffn_abs[0], embed_mask, train=train)

        outs = []
        dw_strides = (dw, dw // 2, max(dw // 4, 1))
        for si in range(3):
            planes = self.body_width[si]
            w = widths[si]
            for bi in range(self.body_depth[si]):
                first = bi == 0
                stride = 2 if (first and si > 0) else 1
                res_conv = first and si > 0
                active = None if (first and si > 0) else \
                    (jnp.asarray(bi, jnp.int32) < depths[si])
                x, x_t = FusionBlock(
                    planes, self.embed_dim, self.num_heads, self.max_ffn,
                    dw_strides[si], strides=stride, res_conv=res_conv,
                    norm_eval=self.norm_eval, dtype=self.dtype,
                    name=f"stage{si}_block{bi}")(
                    x, x_t, w, heads[si], ffn_abs[si], embed_mask,
                    train=train, active=active)
            outs.append(x)

        # last fusion block, stride 2 (reference conv_trans_4, :816-841)
        x, x_t = FusionBlock(
            self.body_width[2], self.embed_dim, self.num_heads, self.max_ffn,
            dw_strides[2], strides=2, res_conv=True, last_fusion=True,
            norm_eval=self.norm_eval, dtype=self.dtype,
            name="last_fusion")(x, x_t, widths[2], heads[2], ffn_abs[2],
                                embed_mask, train=train)
        outs.append(x)
        return tuple(outs[i] for i in self.out_indices)
