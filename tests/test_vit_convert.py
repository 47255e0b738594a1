"""torch->jax ViT/BEiT conversion parity: official-layout torch ckpts load
into ElasticTransformer (reference elastic_transformer1.py:541-581 load
path) and the BEiT teacher (reference dynamic_distiller.py:195-200)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gaiaseg_tpu.engine.torch_convert import (beit_state_dict_to_params,
                                              vit_state_dict_to_params)
from gaiaseg_tpu.models import build_backbone

F32 = jnp.float32


class TMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(TF.gelu(self.fc1(x)))


class TViTBlock(tnn.Module):
    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TMlp(dim, hidden)
        self.heads = heads
        self.hd = dim // heads

    def forward(self, x):
        b, n, d = x.shape
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, self.heads, self.hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = torch.einsum("bnhd,bmhd->bhnm", q, k) / self.hd ** 0.5
        a = a.softmax(-1)
        y = torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(b, n, d)
        x = x + self.attn.proj(y)
        return x + self.mlp(self.norm2(x))


class TViT(tnn.Module):
    """timm/DeiT key layout: patch_embed.proj, cls_token, pos_embed,
    blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}."""

    def __init__(self, dim=64, heads=1, depth=2, patch=4, grid=4):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.zeros(1, grid * grid + 1, dim))
        self.blocks = tnn.ModuleList(
            TViTBlock(dim, heads, dim * 2) for _ in range(depth))

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return x[:, 1:]


def _rand(model):
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.1)


def test_vit_conversion_parity():
    tmodel = TViT().eval()
    _rand(tmodel)
    cfg = dict(type="ElasticTransformer", embed_dim=64, depth=2,
               num_heads=1, ffn_ratio=2.0, patch_size=4, img_size=16,
               out_indices=(1,), dtype=F32)
    bb = build_backbone(cfg)
    arch = {"embedding": {"width": jnp.asarray(64)},
            "encoder": {"depth": jnp.asarray(2),
                        "num_heads": jnp.asarray([1, 1]),
                        "ffn_channels": jnp.asarray([128, 128])}}
    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    v = bb.init(jax.random.PRNGKey(0), jnp.asarray(x), arch)
    new_p = vit_state_dict_to_params(tmodel.state_dict(), v["params"],
                                     ref_grid=4)
    out = bb.apply({"params": new_p}, jnp.asarray(x), arch)[-1]
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.reshape(2, 4, 4, 64).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_vit_conversion_pos_embed_resample():
    """ckpt grid != our reference grid: pos_embed is bicubic-resampled, the
    rest converts; forward stays finite and uses the converted weights."""
    tmodel = TViT(grid=4).eval()
    _rand(tmodel)
    cfg = dict(type="ElasticTransformer", embed_dim=64, depth=2,
               num_heads=1, ffn_ratio=2.0, patch_size=4, img_size=32,
               out_indices=(1,), dtype=F32)   # ref grid 8 != ckpt grid 4
    bb = build_backbone(cfg)
    arch = {"embedding": {"width": jnp.asarray(64)},
            "encoder": {"depth": jnp.asarray(2),
                        "num_heads": jnp.asarray([1, 1]),
                        "ffn_channels": jnp.asarray([128, 128])}}
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3), F32)
    v = bb.init(jax.random.PRNGKey(0), x, arch)
    new_p = vit_state_dict_to_params(tmodel.state_dict(), v["params"],
                                     ref_grid=8)
    assert np.asarray(new_p["pos_embed"]).shape == (1, 65, 64)
    out = bb.apply({"params": new_p}, x, arch)[-1]
    assert np.all(np.isfinite(np.asarray(out)))


class TBeitBlock(tnn.Module):
    def __init__(self, dim, heads, n_rel):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3, bias=False)
        self.attn.q_bias = tnn.Parameter(torch.zeros(dim))
        self.attn.v_bias = tnn.Parameter(torch.zeros(dim))
        self.attn.proj = tnn.Linear(dim, dim)
        self.attn.relative_position_bias_table = tnn.Parameter(
            torch.zeros(n_rel, heads))
        self.gamma_1 = tnn.Parameter(torch.full((dim,), 0.1))
        self.gamma_2 = tnn.Parameter(torch.full((dim,), 0.1))
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TMlp(dim, dim * 4)
        self.heads, self.hd = heads, dim // heads

    def forward(self, x, rel_idx):
        b, n, d = x.shape
        y = self.norm1(x)
        qkv_bias = torch.cat([self.attn.q_bias,
                              torch.zeros_like(self.attn.q_bias),
                              self.attn.v_bias])
        qkv = TF.linear(y, self.attn.qkv.weight, qkv_bias)
        qkv = qkv.reshape(b, n, 3, self.heads, self.hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = torch.einsum("bnhd,bmhd->bhnm", q, k) / self.hd ** 0.5
        bias = self.attn.relative_position_bias_table[
            rel_idx.reshape(-1)].reshape(n, n, self.heads)
        a = a + bias.permute(2, 0, 1)[None]
        a = a.softmax(-1)
        y = torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(b, n, d)
        x = x + self.gamma_1 * self.attn.proj(y)
        return x + self.gamma_2 * self.mlp(self.norm2(x))


class TBeit(tnn.Module):
    def __init__(self, dim=32, heads=2, depth=2, patch=4, grid=4):
        super().__init__()
        n_rel = (2 * grid - 1) ** 2 + 3
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.blocks = tnn.ModuleList(
            TBeitBlock(dim, heads, n_rel) for _ in range(depth))

    def forward(self, x, rel_idx):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        for blk in self.blocks:
            x = blk(x, rel_idx)
        return x[:, 1:]


def test_beit_conversion_parity():
    from gaiaseg_tpu.models.backbones.beit import relative_position_index
    tmodel = TBeit().eval()
    _rand(tmodel)
    with torch.no_grad():
        for blk in tmodel.blocks:
            blk.gamma_1.fill_(0.1)
            blk.gamma_2.fill_(0.1)

    cfg = dict(type="BEiT", embed_dim=32, depth=2, num_heads=2,
               patch_size=4, mlp_ratio=4.0, use_rel_pos_bias=True,
               out_indices=(0, 0, 1, 1), dtype=F32)
    bb = build_backbone(cfg)
    x = np.random.RandomState(2).randn(1, 16, 16, 3).astype(np.float32)
    v = bb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    new_p = beit_state_dict_to_params(tmodel.state_dict(), v["params"])
    # fpn3 (out index 2) is the raw block-1 token map — compare against the
    # torch blocks' final tokens
    f3 = bb.apply({"params": new_p}, jnp.asarray(x))[2]
    rel_idx = torch.from_numpy(relative_position_index(4, 4).astype(np.int64))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2), rel_idx)
    ref = ref.reshape(1, 4, 4, 32).numpy()
    np.testing.assert_allclose(np.asarray(f3), ref, rtol=2e-4, atol=2e-4)
