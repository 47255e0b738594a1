"""ConvNeXt + ElasticTransformer supernet tests and flash-attention parity
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaiaseg_tpu.models import build_backbone, encode_arch
from gaiaseg_tpu.models.arch_util import backbone_max_arch

F32 = jnp.float32

CONVNEXT = dict(type="DynamicConvNeXt", dims=(8, 16, 24, 32),
                depths=(2, 2, 3, 2), out_indices=(0, 1, 2, 3), dtype=F32)

VIT = dict(type="ElasticTransformer", embed_dim=32, depth=4, num_heads=2,
           ffn_ratio=2.0, patch_size=4, img_size=32,
           out_indices=(1, 3), dtype=F32)


@pytest.mark.slow  # >15s on the 1-core box
def test_convnext_shapes_and_masking():
    bb = build_backbone(CONVNEXT)
    max_arch = backbone_max_arch(CONVNEXT)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3), F32)
    full = {"body": {"width": jnp.asarray([8, 16, 24, 32]),
                     "depth": jnp.asarray([2, 2, 3, 2])}}
    v = bb.init(jax.random.PRNGKey(0), x, full)
    outs = bb.apply(v, x, full)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 8), (1, 4, 4, 16), (1, 2, 2, 24), (1, 1, 1, 32)]

    sub = {"body": {"width": jnp.asarray([4, 8, 16, 16]),
                    "depth": jnp.asarray([1, 1, 2, 1])}}
    outs_sub = bb.apply(v, x, sub)
    o1 = np.asarray(outs_sub[1])
    assert np.all(o1[..., 8:] == 0) and np.any(o1[..., :8] != 0)


@pytest.mark.slow  # >15s-ish on the 1-core box
def test_convnext_depth_identity():
    """depth-masked block leaves activations unchanged."""
    bb = build_backbone(CONVNEXT)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3), F32)
    a2 = {"body": {"width": jnp.asarray([8, 16, 24, 32]),
                   "depth": jnp.asarray([2, 2, 3, 2])}}
    a1 = {"body": {"width": jnp.asarray([8, 16, 24, 32]),
                   "depth": jnp.asarray([1, 2, 3, 2])}}
    v = bb.init(jax.random.PRNGKey(0), x, a2)
    o2 = bb.apply(v, x, a2)
    o1 = bb.apply(v, x, a1)
    assert not np.allclose(np.asarray(o2[0]), np.asarray(o1[0]))


def test_elastic_transformer_shapes_and_masking():
    bb = build_backbone(VIT)
    max_arch = backbone_max_arch(VIT)
    assert max_arch["encoder"]["ffn_channels"] == [64, 64, 64, 64]
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), F32)
    arch = {"embedding": {"width": jnp.asarray(32)},
            "encoder": {"depth": jnp.asarray(4),
                        "num_heads": jnp.asarray([2, 2, 2, 2]),
                        "ffn_channels": jnp.asarray([64, 64, 64, 64])}}
    v = bb.init(jax.random.PRNGKey(0), x, arch)
    outs = bb.apply(v, x, arch)
    assert [o.shape for o in outs] == [(2, 8, 8, 32), (2, 8, 8, 32)]

    sub = {"embedding": {"width": jnp.asarray(16)},
           "encoder": {"depth": jnp.asarray(2),
                       "num_heads": jnp.asarray([1, 1, 1, 1]),
                       "ffn_channels": jnp.asarray([32, 32, 32, 32])}}
    outs_sub = bb.apply(v, x, sub)
    o = np.asarray(outs_sub[1])
    assert np.all(o[..., 16:] == 0) and np.any(o[..., :16] != 0)


def test_elastic_mha_masked_heads_equal_sliced():
    """masked-heads attention == attention computed on sliced qkv weights."""
    from gaiaseg_tpu.models.backbones.elastic_transformer import ElasticMHA
    m = ElasticMHA(embed_dim=16, max_heads=2, dtype=F32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 16), F32)
    emb_mask = jnp.ones(16, F32)
    v = m.init(jax.random.PRNGKey(1), x, jnp.asarray(2), emb_mask)
    out1 = m.apply(v, x, jnp.asarray(1), emb_mask)

    import math
    p = v["params"]
    HD = 64
    q = x @ p["w_q"]["kernel"][:, :HD] + p["w_q"]["bias"][:HD]
    k = x @ p["w_k"]["kernel"][:, :HD] + p["w_k"]["bias"][:HD]
    vv = x @ p["w_v"]["kernel"][:, :HD] + p["w_v"]["bias"][:HD]
    attn = jax.nn.softmax((q @ k.transpose(0, 2, 1)) / math.sqrt(HD), -1)
    ref = (attn @ vv) @ p["proj"]["kernel"][:HD] + p["proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_attention_matches_dense_interpret(monkeypatch):
    """Pallas flash kernel == dense softmax attention (interpret mode)."""
    import importlib
    fa = importlib.import_module("gaiaseg_tpu.ops.pallas.flash_attention")
    b, n, h, d = 1, 256, 2, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, n, h, d), F32) * 0.125
    k = jax.random.normal(k2, (b, n, h, d), F32)
    v = jax.random.normal(k3, (b, n, h, d), F32)

    orig = fa.pl.pallas_call
    monkeypatch.setattr(fa.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, interpret=True, **kw))
    out = fa.flash_attention(q, k, v)
    ref = fa._dense_attention(q.transpose(0, 2, 1, 3),
                              k.transpose(0, 2, 1, 3),
                              v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_attention_ragged_tail(monkeypatch):
    """N not a tile multiple: tail keys masked, output matches dense."""
    import importlib
    fa = importlib.import_module("gaiaseg_tpu.ops.pallas.flash_attention")
    b, n, h, d = 1, 200, 1, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, n, h, d), F32) * 0.125
    k = jax.random.normal(ks[1], (b, n, h, d), F32)
    v = jax.random.normal(ks[2], (b, n, h, d), F32)
    orig = fa.pl.pallas_call
    monkeypatch.setattr(fa.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, interpret=True, **kw))
    out = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    ref = fa._dense_attention(q.transpose(0, 2, 1, 3),
                              k.transpose(0, 2, 1, 3),
                              v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_elastic_transformer_rel_pos():
    """2D relative positions: forward runs, differs from absolute-only, and
    the cls slot uses its dedicated index."""
    from gaiaseg_tpu.models.backbones.elastic_transformer import \
        relative_index_2d
    rel_r, rel_c = relative_index_2d(3, 4, max_dist=2, with_cls=True)
    assert rel_r.shape == (13, 13)
    assert rel_r[0, 5] == 2 * 2 + 1 and rel_c[3, 0] == 2 * 2 + 1
    assert rel_r[1, 1] == 2 and rel_c[1, 2] == 1  # same pos / col-dist -1

    cfg = dict(VIT)
    cfg["with_rel_pos"] = True
    bb = build_backbone(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3), F32)
    arch = {"embedding": {"width": jnp.asarray(32)},
            "encoder": {"depth": jnp.asarray(4),
                        "num_heads": jnp.asarray([2, 2, 2, 2]),
                        "ffn_channels": jnp.asarray([64, 64, 64, 64])}}
    v = bb.init(jax.random.PRNGKey(1), x, arch)
    # both sides parameterized, like the reference (rel_pos_embed_k/_v,
    # elastic_transformer.py:128-129)
    assert "rel_pos" in v["params"]["layer0"]["attn"]
    assert "rel_pos_v" in v["params"]["layer0"]["attn"]
    outs = bb.apply(v, x, arch)
    assert outs[-1].shape == (1, 8, 8, 32)
    assert np.all(np.isfinite(np.asarray(outs[-1])))


def test_rel_pos_value_contrib_matches_dense():
    """Output-side rel-pos (reference elastic_transformer.py:173-179):
    the bucketed-one-hot value path equals the naive
    ``sum_j attn[i,j] * (T_r[dr]+T_c[dc])[i,j]`` computation."""
    from gaiaseg_tpu.models.backbones.elastic_transformer import (
        ElasticRelativePosition2D, relative_index_2d)
    md = 2
    rel_r, rel_c = relative_index_2d(3, 3, max_dist=md, with_cls=True)
    rel_r, rel_c = jnp.asarray(rel_r), jnp.asarray(rel_c)
    n = rel_r.shape[0]
    mod = ElasticRelativePosition2D(max_dist=md, head_dim=8, dtype=F32)
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(2), (2, 3, n, n), F32), -1)
    q = jax.random.normal(jax.random.PRNGKey(3), (2, n, 3, 8), F32)
    v = mod.init(jax.random.PRNGKey(4), q, rel_r, rel_c)
    out = mod.apply(v, attn, rel_r, rel_c, method="value_contrib")

    tr = np.asarray(v["params"]["rel_rows"])
    tc = np.asarray(v["params"]["rel_cols"])
    emb = tr[np.asarray(rel_r)] + tc[np.asarray(rel_c)]   # [n,n,d]
    ref = np.einsum("bhij,ijd->bihd", np.asarray(attn), emb)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # >15s on the 1-core box
def test_elastic_mixvit_segformer():
    """SegFormer-style stretch supernet: shapes, masking, head pairing."""
    from gaiaseg_tpu.models import build_segmentor, encode_arch, \
        model_max_arch
    from gaiaseg_tpu.ops.masking import tree_to_ints
    cfg = dict(
        type="DynamicEncoderDecoder",
        backbone=dict(type="ElasticMixViT", widths=(8, 16, 24, 32),
                      depths=(1, 1, 2, 1), num_heads=(1, 1, 1, 1),
                      sr_ratios=(4, 2, 2, 1), ffn_ratio10=20,
                      out_indices=(0, 1, 2, 3), dtype=F32),
        decode_head=dict(type="SegFormerHead", in_index=(0, 1, 2, 3),
                         input_transform="multiple_select", channels=16,
                         dropout_ratio=0.0, num_classes=5, dtype=F32,
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"),
    )
    model = build_segmentor(cfg)
    max_arch = model_max_arch(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3), F32)
    arch = encode_arch(max_arch)
    v = model.init(jax.random.PRNGKey(1), x, arch)
    logit = model.apply(v, x, arch)
    assert logit.shape == (1, 64, 64, 5)

    sub = encode_arch(max_arch, {
        "arch.backbone.body.width": [4, 8, 16, 16],
        "arch.backbone.body.depth": [1, 1, 1, 1],
        "arch.backbone.body.num_heads": [1, 1, 1, 1],
        "arch.backbone.body.ffn_ratio10": [10, 10, 10, 10]})
    feats = model.apply(v, x, sub, method="extract_feat")
    f = np.asarray(feats[2])
    assert np.all(f[..., 16:] == 0) and np.any(f[..., :16] != 0)


def test_flash_attention_backward_matches_dense(monkeypatch):
    """Pallas dQ/dKV kernels == dense-attention gradients (interpret)."""
    import importlib
    fa = importlib.import_module("gaiaseg_tpu.ops.pallas.flash_attention")
    fab = importlib.import_module(
        "gaiaseg_tpu.ops.pallas.flash_attention_bwd")
    b, n, h, d = 1, 200, 2, 64   # ragged tail exercises padding in bwd too
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, n, h, d), F32) * 0.125
    k = jax.random.normal(ks[1], (b, n, h, d), F32)
    v = jax.random.normal(ks[2], (b, n, h, d), F32)
    orig = fa.pl.pallas_call
    monkeypatch.setattr(fa.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, interpret=True, **kw))
    monkeypatch.setattr(fab.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, interpret=True, **kw))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    def loss_dense(q, k, v):
        qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        return jnp.sum(
            fa._dense_attention(qt, kt, vt).transpose(0, 2, 1, 3) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gf, gd, name in zip(g_flash, g_dense, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


@pytest.mark.slow  # >15s on the 1-core box
def test_resnet_scan_blocks_variant():
    """scan_blocks=True: stacked-param layout forward works and depth
    masking behaves identically to the unrolled layout."""
    cfg = dict(type="DynamicResNet", stem_width=8,
               body_width=(8, 8, 16, 16), body_depth=(3, 2, 2, 2),
               out_indices=(0, 1, 2, 3), scan_blocks=True, dtype=F32)
    bb = build_backbone(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3), F32)
    arch = {"stem": {"width": jnp.asarray(8)},
            "body": {"width": jnp.asarray([8, 8, 16, 16]),
                     "depth": jnp.asarray([3, 2, 2, 2])}}
    v = bb.init(jax.random.PRNGKey(1), x, arch)
    # stacked layout: layer1/blocks/b/conv1/kernel has leading depth axis
    assert v["params"]["layer1"]["blocks"]["b"]["conv1"]["kernel"].shape[0] \
        == 2
    outs = bb.apply(v, x, arch)
    assert outs[0].shape == (1, 8, 8, 32)
    shallow = {**arch, "body": {"width": arch["body"]["width"],
                                "depth": jnp.asarray([1, 2, 2, 2])}}
    outs2 = bb.apply(v, x, shallow)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs2[0]))
