"""BEiT: static ViT backbone used as distillation teacher.

Capability parity with the reference BEiT (reference
gaiaseg/models/backbones/beit.py:51-434): standard ViT blocks with
shared/per-block 2D relative-position-bias tables, layer-scale gammas,
conv patch embed, and 4-scale FPN adapters (fpn1 = 2x [deconv x2 + norm +
GELU] => 4x upsample; fpn2 = deconv x2; fpn3 = identity; fpn4 = maxpool /2
for patch16, reference :326-354). Teacher-only: no elasticity, runs frozen
under stop_gradient inside the distiller.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.dynamic_layers import DynConv2d, DynLayerNorm, DynLinear
from ...utils.registry import BACKBONES

Array = jnp.ndarray


def relative_position_index(h: int, w: int) -> np.ndarray:
    """BEiT window relative-position index incl. cls token:
    [(h*w+1), (h*w+1)] into a table of (2h-1)*(2w-1)+3 entries."""
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w),
                                  indexing="ij"))      # [2, h, w]
    flat = coords.reshape(2, -1)                        # [2, hw]
    rel = flat[:, :, None] - flat[:, None, :]           # [2, hw, hw]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    num = (2 * h - 1) * (2 * w - 1)
    idx = np.zeros((h * w + 1, h * w + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num
    idx[0:, 0] = num + 1
    idx[0, 0] = num + 2
    return idx


class BEiTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, rel_bias: Optional[Array] = None, *,
                 train: bool = False) -> Array:
        b, n, _ = x.shape
        hd = self.dim // self.num_heads
        y = DynLayerNorm(self.dim, dtype=self.dtype, name="norm1")(x)
        qkv = DynLinear(self.dim * 3, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.num_heads, hd), 3, 2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32)).astype(self.dtype)
        if rel_bias is not None:
            attn = attn + rel_bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, self.dim)
        y = DynLinear(self.dim, dtype=self.dtype, name="proj")(y)
        g1 = self.param("gamma_1", nn.initializers.constant(self.init_values),
                        (self.dim,), jnp.float32)
        x = x + y * g1.astype(self.dtype)

        z = DynLayerNorm(self.dim, dtype=self.dtype, name="norm2")(x)
        z = DynLinear(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                      name="fc1")(z)
        # exact (erf) GELU: torch nn.GELU default — keeps converted teacher
        # checkpoints bit-faithful
        z = jax.nn.gelu(z, approximate=False)
        z = DynLinear(self.dim, dtype=self.dtype, name="fc2")(z)
        g2 = self.param("gamma_2", nn.initializers.constant(self.init_values),
                        (self.dim,), jnp.float32)
        return x + z * g2.astype(self.dtype)


@BACKBONES.register_module(name=["BEiT", "Beit"])
class BEiT(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 0.1
    use_rel_pos_bias: bool = True
    use_shared_rel_pos_bias: bool = False
    out_indices: Sequence[int] = (3, 5, 7, 11)
    dtype: Any = jnp.bfloat16

    def out_channels(self):
        return tuple(self.embed_dim for _ in self.out_indices)

    @nn.compact
    def __call__(self, x: Array, arch: Optional[Dict] = None, *,
                 train: bool = False):
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        n = gh * gw
        x = DynConv2d(self.embed_dim, self.patch_size, self.patch_size,
                      use_bias=True, padding=0, dtype=self.dtype,
                      name="patch_embed")(x)
        x = x.reshape(b, n, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, self.embed_dim), jnp.float32)
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x],
                            axis=1)

        rel_idx = None
        num_dist = (2 * gh - 1) * (2 * gw - 1) + 3
        if self.use_rel_pos_bias or self.use_shared_rel_pos_bias:
            rel_idx = jnp.asarray(relative_position_index(gh, gw))

        def bias_for(name):
            table = self.param(name, nn.initializers.zeros,
                               (num_dist, self.num_heads), jnp.float32)
            bias = table[rel_idx.reshape(-1)].reshape(
                n + 1, n + 1, self.num_heads)
            return bias.transpose(2, 0, 1)

        shared_bias = bias_for("rel_pos_bias_table") \
            if self.use_shared_rel_pos_bias else None

        feats = {}
        out_idx = [i if i >= 0 else self.depth + i for i in self.out_indices]
        for i in range(self.depth):
            bias = shared_bias
            if self.use_rel_pos_bias and not self.use_shared_rel_pos_bias:
                bias = bias_for(f"rel_pos_bias_table_{i}")
            x = BEiTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                          self.init_values, dtype=self.dtype,
                          name=f"block{i}")(x, bias, train=train)
            if i in out_idx:
                feats[i] = x[:, 1:].reshape(b, gh, gw, self.embed_dim)
        outs = [feats[i] for i in out_idx]  # duplicates allowed

        # FPN adapters (reference beit.py:326-354, patch16 variant)
        def deconv2x(y, name):
            return nn.ConvTranspose(self.embed_dim, (2, 2), (2, 2),
                                    dtype=self.dtype, name=name)(y)

        f1 = deconv2x(outs[0], "fpn1_deconv1")
        f1 = DynLayerNorm(self.embed_dim, dtype=self.dtype,
                          name="fpn1_norm")(f1)
        f1 = nn.gelu(f1)
        f1 = deconv2x(f1, "fpn1_deconv2")
        f2 = deconv2x(outs[1], "fpn2_deconv")
        f3 = outs[2]
        f4 = nn.max_pool(outs[3], (2, 2), (2, 2))
        return (f1, f2, f3, f4)
