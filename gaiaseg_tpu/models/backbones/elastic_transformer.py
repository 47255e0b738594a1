"""ElasticTransformer: elastic ViT supernet backbone (masked, NHWC maps).

Capability parity with the reference's two elastic ViT variants
(reference gaiaseg/models/backbones/elastic_transformer.py:346-601 — stage
dynamic — and elastic_transformer1.py:381-657 — layer dynamic): conv patch
embed, cls token + (resized) position embeddings, pre-norm encoder layers
with ElasticMHA (fixed head_dim=64, elastic num_heads via heads*64 width)
and ElasticFFN (elastic hidden width, reference ratio ``ffc/10*embed_dim``),
elastic layer count, outputs reshaped to [N, H/p, W/p, C] feature maps at
``out_indices``.

This single class is layer-granular (the strictly more general variant,
backbones/__init__.py:4-5 of the reference): per-layer ``num_heads`` /
``ffn_channels`` arrays; a stage-structured space is a per-layer array with
repeated values. Masked-head correctness: a fully masked head attends
uniformly over zeroed values and contributes exactly zero to the output
projection, matching sliced-QKV semantics (property-tested).

Set ``use_flash=True`` to run attention through the Pallas flash kernel
(ops/pallas/flash_attention.py) when sequence length allows.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.dynamic_layers import DynConv2d, DynLayerNorm, DynLinear
from ...ops.masking import channel_mask
from ...utils.registry import BACKBONES

Array = jnp.ndarray

HEAD_DIM = 64  # fixed head width; heads are elastic (reference :131-142)


def relative_index_2d(gh: int, gw: int, max_dist: int,
                      with_cls: bool = True):
    """Clipped row/col relative-distance index matrices [(N),(N)] with a
    dedicated cls index (reference ElasticRelativePosition2D cls-token pad,
    elastic_transformer.py:67-104). Table layout: 0..2*max_dist clipped
    distances, 2*max_dist+1 = cls<->any."""
    import numpy as np
    rows = np.arange(gh).repeat(gw)
    cols = np.tile(np.arange(gw), gh)
    dr = np.clip(rows[:, None] - rows[None, :], -max_dist, max_dist) \
        + max_dist
    dc = np.clip(cols[:, None] - cols[None, :], -max_dist, max_dist) \
        + max_dist
    if with_cls:
        cls_idx = 2 * max_dist + 1
        n = gh * gw + 1
        full_r = np.full((n, n), cls_idx, np.int32)
        full_c = np.full((n, n), cls_idx, np.int32)
        full_r[1:, 1:] = dr
        full_c[1:, 1:] = dc
        return full_r, full_c
    return dr.astype(np.int32), dc.astype(np.int32)


class ElasticRelativePosition2D(nn.Module):
    """2D-decomposed Shaw-style relative positions: a row table + a col
    table of per-distance embeddings, ``R[i,j] = T_row[dr] + T_col[dc]``
    (reference ElasticRelativePosition2D :67-104). Used on the score side
    (``q . R`` added to attention logits, reference :162-167) and on the
    value side (``attn @ R`` added to the attention output, :173-179)."""

    max_dist: int = 14
    head_dim: int = HEAD_DIM
    dtype: Any = jnp.bfloat16

    def setup(self):
        n_entries = 2 * self.max_dist + 2  # + cls slot
        self.table_r = self.param(
            "rel_rows", nn.initializers.truncated_normal(0.02),
            (n_entries, self.head_dim), jnp.float32)
        self.table_c = self.param(
            "rel_cols", nn.initializers.truncated_normal(0.02),
            (n_entries, self.head_dim), jnp.float32)

    def __call__(self, q: Array, rel_r: Array, rel_c: Array) -> Array:
        """q: [b, n, h, d]; rel_r/rel_c: [n, n] int32 -> scores [b,h,n,n]."""
        # separable: project q onto every distance embedding, then gather
        qr = jnp.einsum("bnhd,kd->bhnk", q,
                        self.table_r.astype(q.dtype))     # [b,h,n,K]
        qc = jnp.einsum("bnhd,kd->bhnk", q, self.table_c.astype(q.dtype))
        s_r = jnp.take_along_axis(qr, rel_r[None, None], axis=-1)
        s_c = jnp.take_along_axis(qc, rel_c[None, None], axis=-1)
        return s_r + s_c

    def value_contrib(self, attn: Array, rel_r: Array, rel_c: Array
                      ) -> Array:
        """attn: [b,h,n,n] -> output-side contribution [b,n,h,d]:
        ``out[i] += sum_j attn[i,j] * R[i,j]`` (reference :173-179).

        TPU shape: never materializes the [n,n,d] embedding tensor — the
        attention mass is first bucketed per clipped distance (K = 2*14+2
        entries < head_dim), then one [K,d] matmul per table."""
        k_entries = self.table_r.shape[0]
        dt = attn.dtype
        oh_r = jax.nn.one_hot(rel_r, k_entries, dtype=dt)     # [n,n,K]
        oh_c = jax.nn.one_hot(rel_c, k_entries, dtype=dt)
        w_r = jnp.einsum("bhij,ijk->bhik", attn, oh_r)
        w_c = jnp.einsum("bhij,ijk->bhik", attn, oh_c)
        contrib = jnp.einsum("bhik,kd->bhid", w_r,
                             self.table_r.astype(dt)) + \
            jnp.einsum("bhik,kd->bhid", w_c, self.table_c.astype(dt))
        return contrib.transpose(0, 2, 1, 3)                  # [b,n,h,d]


class ElasticMHA(nn.Module):
    embed_dim: int           # MAX embed width
    max_heads: int
    use_flash: bool = False
    with_rel_pos: bool = False
    rel_max_dist: int = 14
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, num_heads: Array, embed_mask: Array, *,
                 train: bool = False, rel_index=None) -> Array:
        b, n, _ = x.shape
        inner = self.max_heads * HEAD_DIM
        head_mask = channel_mask(num_heads * HEAD_DIM, inner, self.dtype)
        q = DynLinear(inner, dtype=self.dtype, name="w_q")(x, head_mask)
        k = DynLinear(inner, dtype=self.dtype, name="w_k")(x, head_mask)
        v = DynLinear(inner, dtype=self.dtype, name="w_v")(x, head_mask)
        q = q.reshape(b, n, self.max_heads, HEAD_DIM)
        k = k.reshape(b, n, self.max_heads, HEAD_DIM)
        v = v.reshape(b, n, self.max_heads, HEAD_DIM)
        scale = 1.0 / math.sqrt(HEAD_DIM)
        use_rel = self.with_rel_pos and rel_index is not None
        on_tpu = jax.devices()[0].platform == "tpu"
        if self.use_flash and on_tpu and n % 128 == 0 and not use_rel:
            from ...ops.pallas.flash_attention import flash_attention
            out = flash_attention(q * scale, k, v)
        else:
            logits = jnp.einsum("bnhd,bmhd->bhnm", q,
                                k).astype(jnp.float32) * scale
            if use_rel:
                # reference adds the rel-pos score UNSCALED on top of the
                # scaled qk logits (elastic_transformer.py:162-167)
                rel_r, rel_c = rel_index
                rp_k = ElasticRelativePosition2D(
                    self.rel_max_dist, dtype=self.dtype, name="rel_pos")
                logits = logits + rp_k(q, rel_r,
                                       rel_c).astype(jnp.float32)
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
            if use_rel:
                # output-side rel-pos (reference :173-179): attn @ R_v,
                # shared across heads, added before the out projection
                rp_v = ElasticRelativePosition2D(
                    self.rel_max_dist, dtype=self.dtype, name="rel_pos_v")
                out = out + rp_v.value_contrib(attn, rel_r, rel_c)
        out = out.reshape(b, n, inner) * head_mask
        return DynLinear(self.embed_dim, dtype=self.dtype, name="proj")(
            out, embed_mask)


class ElasticEncoderLayer(nn.Module):
    """Pre-norm transformer layer (reference :190-222)."""

    embed_dim: int
    max_heads: int
    max_ffn: int
    use_flash: bool = False
    with_rel_pos: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, num_heads: Array, ffn_channels: Array,
                 embed_mask: Array, *, train: bool = False,
                 active: Optional[Array] = None, rel_index=None) -> Array:
        y = DynLayerNorm(self.embed_dim, dtype=self.dtype, name="norm1")(
            x, embed_mask)
        y = ElasticMHA(self.embed_dim, self.max_heads,
                       use_flash=self.use_flash,
                       with_rel_pos=self.with_rel_pos, dtype=self.dtype,
                       name="attn")(y, num_heads, embed_mask, train=train,
                                    rel_index=rel_index)
        x1 = x + y
        z = DynLayerNorm(self.embed_dim, dtype=self.dtype, name="norm2")(
            x1, embed_mask)
        ffn_mask = channel_mask(ffn_channels, self.max_ffn, self.dtype)
        z = DynLinear(self.max_ffn, dtype=self.dtype, name="fc1")(z, ffn_mask)
        # exact (erf) GELU matches torch nn.GELU for converted ViT ckpts
        z = jax.nn.gelu(z, approximate=False)
        z = DynLinear(self.embed_dim, dtype=self.dtype, name="fc2")(
            z, embed_mask)
        out = x1 + z
        if active is not None:
            out = jnp.where(active, out, x)
        return out


@BACKBONES.register_module(name=["ElasticTransformer", "ElasticTransformer1"])
class ElasticTransformer(nn.Module):
    embed_dim: int = 768              # MAX embed width
    depth: int = 12                   # MAX layer count
    num_heads: int = 12               # MAX heads/layer
    ffn_ratio: float = 4.0            # MAX ffn width = ratio * embed_dim
    patch_size: int = 16
    img_size: int = 224               # pos-embed grid reference size
    out_indices: Sequence[int] = (2, 5, 8, 11)
    with_cls_token: bool = True
    use_flash: bool = False
    with_rel_pos: bool = False
    rel_max_dist: int = 14
    drop_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    search_space = ("embedding", "encoder")

    @property
    def max_ffn(self) -> int:
        return int(self.ffn_ratio * self.embed_dim)

    def max_arch(self) -> Dict[str, Any]:
        return {
            "embedding": {"width": self.embed_dim},
            "encoder": {
                "depth": self.depth,
                "num_heads": [self.num_heads] * self.depth,
                "ffn_channels": [self.max_ffn] * self.depth,
            },
        }

    def out_channels(self):
        return tuple(self.embed_dim for _ in self.out_indices)

    @nn.compact
    def __call__(self, x: Array, arch: Dict[str, Any], *,
                 train: bool = False):
        emb = arch["embedding"]["width"]
        enc = arch["encoder"]
        depth = enc["depth"]
        heads = jnp.asarray(enc["num_heads"], jnp.int32)
        ffns = jnp.asarray(enc["ffn_channels"], jnp.int32)
        embed_mask = channel_mask(emb, self.embed_dim, self.dtype)

        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        x = DynConv2d(self.embed_dim, self.patch_size, self.patch_size,
                      use_bias=True, padding=0, dtype=self.dtype,
                      name="patch_embed")(x, embed_mask)
        x = x.reshape(b, gh * gw, self.embed_dim)

        # position embeddings at the reference grid, bicubic-resized to the
        # actual grid (reference resize_pos_embed :501-529)
        ref_g = self.img_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, ref_g * ref_g + 1, self.embed_dim), jnp.float32)
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (ref_g, ref_g):
            grid_pos = grid_pos.reshape(1, ref_g, ref_g, self.embed_dim)
            grid_pos = jax.image.resize(
                grid_pos, (1, gh, gw, self.embed_dim), method="bicubic")
            grid_pos = grid_pos.reshape(1, gh * gw, self.embed_dim)
        x = x + grid_pos.astype(self.dtype) * embed_mask

        if self.with_cls_token:
            cls = self.param("cls_token",
                             nn.initializers.truncated_normal(0.02),
                             (1, 1, self.embed_dim), jnp.float32)
            cls = (cls + cls_pos).astype(self.dtype) * embed_mask
            x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)

        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train,
                           name="pos_drop")(x)

        rel_index = None
        if self.with_rel_pos:
            rel_r, rel_c = relative_index_2d(gh, gw, self.rel_max_dist,
                                             self.with_cls_token)
            rel_index = (jnp.asarray(rel_r), jnp.asarray(rel_c))

        outs = []
        out_idx = [i if i >= 0 else self.depth + i for i in self.out_indices]
        for i in range(self.depth):
            active = jnp.asarray(i, jnp.int32) < depth
            x = ElasticEncoderLayer(
                self.embed_dim, self.num_heads, self.max_ffn,
                use_flash=self.use_flash, with_rel_pos=self.with_rel_pos,
                dtype=self.dtype,
                name=f"layer{i}")(x, heads[i], ffns[i], embed_mask,
                                  train=train, active=active,
                                  rel_index=rel_index)
            if i in out_idx:
                tokens = x[:, 1:] if self.with_cls_token else x
                outs.append(tokens.reshape(b, gh, gw, self.embed_dim))
        if self.depth - 1 not in out_idx and not outs:
            tokens = x[:, 1:] if self.with_cls_token else x
            outs.append(tokens.reshape(b, gh, gw, self.embed_dim))
        return tuple(outs)
