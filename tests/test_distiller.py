"""DynamicDistiller: student+teacher joint step, distill losses, frozen
teacher gradients; checkpoint-surgery shape tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaiaseg_tpu.models import build_segmentor
from gaiaseg_tpu.models.arch_util import encode_arch, model_max_arch
from gaiaseg_tpu.models.segmentors import frozen_param_labels

F32 = jnp.float32

DISTILLER = dict(
    type="DynamicDistiller",
    backbone=dict(type="DynamicResNet", stem_width=8,
                  body_width=[8, 8, 16, 16], body_depth=[1, 1, 1, 1],
                  out_indices=(0, 1, 2, 3), dtype=F32),
    decode_head=dict(type="DynamicPSPHead", in_index=3, channels=8,
                     pool_scales=(1, 2), dropout_ratio=0.0, num_classes=4,
                     dtype=F32, loss_decode=dict(type="CrossEntropyLoss")),
    teacher_backbone=dict(type="BEiT", embed_dim=32, depth=2, num_heads=2,
                          patch_size=8, out_indices=(0, 1, 1, 1),
                          use_rel_pos_bias=True, dtype=F32),
    teacher_decode_head=dict(type="DynamicFCNHead", in_index=1, channels=8,
                             num_convs=1, concat_input=False,
                             dropout_ratio=0.0, num_classes=4, dtype=F32),
    distill_cfg=dict(temperature=2.0, distill_weight=1.0,
                     pairwise_weight=0.5),
    test_cfg=dict(mode="whole"),
)


@pytest.mark.slow  # >15s on the 1-core box
def test_distiller_train_step_and_frozen_teacher():
    model = build_segmentor(DISTILLER)
    max_arch = model_max_arch(DISTILLER)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), F32)
    gt = jax.random.randint(jax.random.PRNGKey(1), (2, 32, 32), 0, 4)
    arch = encode_arch(max_arch)
    k = jax.random.PRNGKey(2)
    variables = model.init({"params": k, "dropout": k}, img, gt, arch,
                           method="forward_train")

    def loss_fn(params):
        (total, logs), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, gt, arch, method="forward_train",
            mutable=["batch_stats"], rngs={"dropout": k})
        return total, logs

    (total, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    assert "distill_loss_seg" in logs and "pairwise_loss_seg" in logs
    assert float(logs["distill_loss_seg"]) > 0

    # teacher gradients are exactly zero (stop_gradient)
    for name in ("t_backbone", "t_decode_head"):
        gsum = sum(float(jnp.sum(jnp.abs(x)))
                   for x in jax.tree_util.tree_leaves(grads[name]))
        assert gsum == 0.0, name
    # student gradients flow
    s = sum(float(jnp.sum(jnp.abs(x)))
            for x in jax.tree_util.tree_leaves(grads["backbone_m"]))
    assert s > 0

    labels = frozen_param_labels(variables["params"])
    assert labels["t_backbone"]["block0"]["qkv"]["kernel"] is True
    assert labels["backbone_m"]["stem0"]["conv"]["kernel"] is False


@pytest.mark.slow  # >15s-ish on the 1-core box
def test_teacher_checkpoint_load_from_torch_pth(tmp_path):
    """A FULL torch teacher segmentor .pth (backbone.* + decode_head.*)
    loads into the distiller's frozen teacher — the reference loads a full
    segmentor checkpoint (reference dynamic_distiller.py:195-200), so a
    backbone-only ckpt leaving t_decode_head at random init must raise."""
    import pytest
    torch = pytest.importorskip("torch")
    from test_vit_convert import TBeit, _rand
    from gaiaseg_tpu.engine.train import load_teacher_checkpoint

    model = build_segmentor(DISTILLER)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3), F32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    arch = encode_arch(model_max_arch(DISTILLER))
    k = jax.random.PRNGKey(1)
    variables = model.init({"params": k, "dropout": k}, img, gt, arch,
                           method="forward_train")

    tmodel = TBeit(dim=32, heads=2, depth=2, patch=8, grid=4).eval()
    _rand(tmodel)
    sd = {"backbone." + k: v for k, v in tmodel.state_dict().items()}

    # backbone-only ckpt: silently-random teacher head is an error
    bb_path = str(tmp_path / "teacher_bb_only.pth")
    torch.save({"state_dict": dict(sd)}, bb_path)
    with pytest.raises(ValueError, match="decode_head"):
        load_teacher_checkpoint(bb_path, variables["params"],
                                variables["batch_stats"], DISTILLER)

    # full teacher: reference-layout FCN head keys (convs.{i}.conv/bn,
    # conv_seg) convert into t_decode_head
    rs = np.random.RandomState(3)
    tdh = variables["params"]["t_decode_head"]
    k0 = np.asarray(tdh["conv0"]["conv"]["kernel"])    # (kh,kw,in,out)
    w0 = rs.randn(k0.shape[3], k0.shape[2],
                  k0.shape[0], k0.shape[1]).astype(np.float32)
    ws = rs.randn(4, k0.shape[3], 1, 1).astype(np.float32)
    sd.update({
        "decode_head.convs.0.conv.weight": torch.tensor(w0),
        "decode_head.convs.0.bn.weight":
            torch.tensor(rs.randn(k0.shape[3]).astype(np.float32)),
        "decode_head.convs.0.bn.bias":
            torch.tensor(rs.randn(k0.shape[3]).astype(np.float32)),
        "decode_head.convs.0.bn.running_mean":
            torch.tensor(rs.randn(k0.shape[3]).astype(np.float32)),
        "decode_head.convs.0.bn.running_var":
            torch.tensor(np.abs(rs.randn(k0.shape[3])).astype(np.float32)),
        "decode_head.conv_seg.weight": torch.tensor(ws),
        "decode_head.conv_seg.bias":
            torch.tensor(rs.randn(4).astype(np.float32)),
    })
    path = str(tmp_path / "teacher.pth")
    torch.save({"state_dict": sd}, path)

    new_params, new_stats = load_teacher_checkpoint(
        path, variables["params"], variables["batch_stats"], DISTILLER)
    got = np.asarray(new_params["t_backbone"]["block0"]["qkv"]["kernel"])
    want = tmodel.blocks[0].attn.qkv.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    got_h = np.asarray(new_params["t_decode_head"]["conv0"]["conv"]["kernel"])
    np.testing.assert_allclose(got_h, w0.transpose(2, 3, 1, 0),
                               rtol=1e-6, atol=1e-6)
    got_s = np.asarray(new_params["t_decode_head"]["conv_seg"]["kernel"])
    np.testing.assert_allclose(got_s, ws.transpose(2, 3, 1, 0),
                               rtol=1e-6, atol=1e-6)
    # distiller forward still runs with the loaded teacher
    (total, _), _ = model.apply(
        {"params": new_params, "batch_stats": new_stats},
        img, gt, arch, method="forward_train", mutable=["batch_stats"],
        rngs={"dropout": k})
    assert np.isfinite(float(total))


DISTILLER_RESNET = dict(
    type="DynamicDistiller",
    backbone=dict(type="DynamicResNet", stem_width=8,
                  body_width=[8, 8, 16, 16], body_depth=[1, 1, 1, 1],
                  out_indices=(0, 1, 2, 3), dtype=F32),
    decode_head=dict(type="DynamicPSPHead", in_index=3, channels=8,
                     pool_scales=(1, 2), dropout_ratio=0.0, num_classes=4,
                     dtype=F32, loss_decode=dict(type="CrossEntropyLoss")),
    teacher_backbone=dict(type="DynamicResNet", stem_width=8,
                          body_width=[8, 8, 16, 16],
                          body_depth=[1, 1, 1, 1],
                          out_indices=(0, 1, 2, 3), dtype=F32),
    teacher_decode_head=dict(type="DynamicPSPHead", in_index=3, channels=8,
                             pool_scales=(1, 2), dropout_ratio=0.0,
                             num_classes=4, dtype=F32,
                             loss_decode=dict(type="CrossEntropyLoss")),
    distill_cfg=dict(temperature=2.0, distill_weight=1.0,
                     pairwise_weight=0.5),
    test_cfg=dict(mode="whole"),
)


def test_elastic_teacher_runs_at_max_and_stays_frozen():
    """Teacher may be an elastic backbone (self-distillation: a trained
    supernet at MAX arch teaches a fresh one). Extension beyond the
    reference's static-BEiT teacher; frozen-teacher semantics identical
    (reference dynamic_distiller.py:195-200,264-274)."""
    model = build_segmentor(DISTILLER_RESNET)
    max_arch = model_max_arch(DISTILLER_RESNET)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), F32)
    gt = jax.random.randint(jax.random.PRNGKey(1), (2, 32, 32), 0, 4)
    arch = encode_arch(max_arch)
    k = jax.random.PRNGKey(2)
    variables = model.init({"params": k, "dropout": k}, img, gt, arch,
                           method="forward_train")

    def loss_fn(params):
        (total, logs), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, gt, arch, method="forward_train",
            mutable=["batch_stats"], rngs={"dropout": k})
        return total, logs

    (total, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    assert float(logs["distill_loss_seg"]) > 0
    for name in ("t_backbone", "t_decode_head"):
        gsum = sum(float(jnp.sum(jnp.abs(x)))
                   for x in jax.tree_util.tree_leaves(grads[name]))
        assert gsum == 0.0, name


def test_make_teacher_ckpt_roundtrip(tmp_path):
    """tools/make_teacher_ckpt.py: a trained student segmentor checkpoint
    remaps into the distiller's t_* subtrees and loads bit-exact."""
    import sys, os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
    import jax.numpy as jnp
    from make_teacher_ckpt import convert
    from gaiaseg_tpu.engine.checkpoint import save_checkpoint
    from gaiaseg_tpu.engine.train import load_teacher_checkpoint

    # the "trained" model: the plain student segmentor of DISTILLER_RESNET
    plain_cfg = {k: v for k, v in DISTILLER_RESNET.items()
                 if not k.startswith(("teacher_", "distill_"))}
    plain_cfg["type"] = "DynamicEncoderDecoder"
    plain = build_segmentor(plain_cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3), F32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    arch = encode_arch(model_max_arch(plain_cfg))
    k = jax.random.PRNGKey(7)
    pv = plain.init({"params": k, "dropout": k}, img, gt, arch,
                    method="forward_train")
    src = str(tmp_path / "trained.ckpt")
    save_checkpoint(src, {"params": pv["params"],
                          "batch_stats": pv["batch_stats"]})
    dst = str(tmp_path / "teacher.ckpt")
    convert(src, dst)

    distiller = build_segmentor(DISTILLER_RESNET)
    dv = distiller.init({"params": k, "dropout": k}, img, gt, arch,
                        method="forward_train")
    new_p, new_s = load_teacher_checkpoint(dst, dv["params"],
                                           dv["batch_stats"],
                                           DISTILLER_RESNET)
    want = pv["params"]["backbone_m"]["stem0"]["conv"]["kernel"]
    got = new_p["t_backbone"]["stem0"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    got_s = new_s["t_backbone"]["stem0"]["bn"]["mean"]
    want_s = pv["batch_stats"]["backbone_m"]["stem0"]["bn"]["mean"]
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
    # student subtrees untouched
    np.testing.assert_array_equal(
        np.asarray(new_p["backbone_m"]["stem0"]["conv"]["kernel"]),
        np.asarray(dv["params"]["backbone_m"]["stem0"]["conv"]["kernel"]))


def test_rel_pos_table_resample_shapes():
    from gaiaseg_tpu.engine.ckpt_surgery import resample_rel_pos_bias_table
    src, dst, heads = 7, 14, 3
    table = np.random.RandomState(0).randn(
        (2 * src - 1) ** 2 + 3, heads).astype(np.float32)
    out = resample_rel_pos_bias_table(table, src, dst)
    assert out.shape == ((2 * dst - 1) ** 2 + 3, heads)
    np.testing.assert_array_equal(out[-3:], table[-3:])  # cls rows preserved
    assert np.all(np.isfinite(out))


def test_resize_pos_embed():
    from gaiaseg_tpu.engine.ckpt_surgery import resize_pos_embed
    pos = np.random.RandomState(0).randn(1, 5 * 5 + 1, 8).astype(np.float32)
    out = resize_pos_embed(pos, (5, 5), (7, 9))
    assert out.shape == (1, 7 * 9 + 1, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])
