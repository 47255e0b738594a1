"""Tensor parallelism over the ``model`` mesh axis (TPU extension;
SURVEY.md §2.10 "leave named axes open").

Params are sharded by parallel/mesh.py::tp_spec (Megatron-style column/
row rules for transformer qkv/proj/fc1/fc2, output-channel sharding for
wide kernels) and GSPMD inserts the collectives. The contract: a train
step on a data x model mesh produces the SAME numerics as pure DP."""
import jax
import jax.numpy as jnp
import numpy as np

from gaiaseg_tpu.engine import create_train_state, make_train_step
from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
from gaiaseg_tpu.models import build_segmentor, encode_arch, model_max_arch
from gaiaseg_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                       shard_report, shard_state, tp_spec)
from jax.sharding import PartitionSpec as P
import pytest

F32 = jnp.float32

MODEL = dict(
    type="DynamicEncoderDecoder",
    backbone=dict(type="ElasticTransformer", embed_dim=128, depth=2,
                  num_heads=2, ffn_ratio=2.0, patch_size=8, img_size=32,
                  out_indices=(0, 1), dtype=F32),
    decode_head=dict(type="DynamicFCNHead", in_index=1, channels=32,
                     num_convs=1, concat_input=False, dropout_ratio=0.0,
                     num_classes=4, dtype=F32,
                     loss_decode=dict(type="CrossEntropyLoss")),
    test_cfg=dict(mode="whole"))


def test_tp_spec_rules():
    assert tp_spec("backbone/layers_0/attn/qkv/kernel", (128, 384), 2,
                   min_size=1) == P(None, "model")
    assert tp_spec("backbone/layers_0/attn/proj/kernel", (128, 128), 2,
                   min_size=1) == P("model", None)
    assert tp_spec("backbone/layers_0/fc2/kernel", (256, 128), 2,
                   min_size=1) == P("model", None)
    # conv kernel: output-channel sharding on the last dim
    assert tp_spec("backbone/stem/conv/kernel", (3, 3, 16, 64), 2,
                   min_size=1) == P(None, None, None, "model")
    # indivisible / tiny / 1-D leaves stay replicated
    assert tp_spec("head/conv_seg/kernel", (1, 1, 32, 5), 2,
                   min_size=1) == P()
    assert tp_spec("bn/scale", (64,), 2, min_size=1) == P()
    assert tp_spec("x/kernel", (8, 8), 2) == P()  # below min_size


@pytest.mark.slow  # >15s on the 1-core box
def test_tp_step_matches_dp():
    model = build_segmentor(MODEL)
    max_arch = model_max_arch(MODEL)
    arch = encode_arch(max_arch)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (8, 32, 32, 3), F32)
    gt = jax.random.randint(rng, (8, 32, 32), 0, 4)
    sched = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 100)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9), None,
                         sched)
    step = make_train_step(model, tx, update_stats=False, with_logs=False)

    results = {}
    for tp in (1, 2):
        mesh = make_mesh(model_parallel=tp)
        assert mesh.shape["model"] == tp
        state = create_train_state(model, rng, img, arch, tx)
        # min_size=1 so the tiny kernels genuinely shard (the default
        # gate would replicate everything and compare DP against DP)
        state = shard_state(state, mesh, min_size=1) if tp > 1 \
            else replicate(state, mesh)
        if tp > 1:
            wq = state.params["backbone_m"]["layer0"]["attn"]["w_q"][
                "kernel"]
            assert "model" in str(wq.sharding.spec), wq.sharding
            fc2 = state.params["backbone_m"]["layer0"]["fc2"]["kernel"]
            assert fc2.sharding.spec[0] == "model", fc2.sharding
        batch = shard_batch({"img": img, "gt": gt}, mesh)
        state, _ = step(state, batch["img"], batch["gt"], arch, rng)
        results[tp] = jax.tree_util.tree_map(np.asarray, state.params)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        results[1], results[2])


def test_tp_spec_segment_matching_no_false_positives():
    """'proj'/'fc2' are matched as WHOLE path segments — an ASPP head's
    'c1_proj' conv or a 'patch_embed/proj'-free layout must not get
    row-parallel input-dim sharding (advisor finding: substring matching
    row-sharded a conv kernel)."""
    assert tp_spec("decode_head_m/c1_proj/conv/kernel", (1, 1, 64, 64), 2,
                   min_size=1) == P(None, None, None, "model")
    assert tp_spec("backbone_m/reproject/kernel", (64, 64), 2,
                   min_size=1) == P(None, "model")
    # the real out-projection still row-shards
    assert tp_spec("backbone_m/layer0/attn/proj/kernel", (64, 64), 2,
                   min_size=1) == P("model", None)


FLAGSHIP_TINY = dict(
    type="DynamicEncoderDecoder",
    backbone=dict(type="DynamicResNet", stem_width=8,
                  body_width=[8, 16, 24, 32], body_depth=[2, 2, 3, 2],
                  out_indices=(0, 1, 2, 3), dtype=F32),
    decode_head=dict(type="DynamicPSPHead", in_index=3, channels=16,
                     pool_scales=(1, 2), dropout_ratio=0.0, num_classes=6,
                     dtype=F32, loss_decode=dict(type="CrossEntropyLoss")),
    auxiliary_head=dict(type="DynamicFCNHead", in_index=2, channels=8,
                        num_convs=1, concat_input=True, dropout_ratio=0.0,
                        num_classes=6, dtype=F32,
                        loss_decode=dict(type="CrossEntropyLoss",
                                         loss_weight=0.4)),
    test_cfg=dict(mode="whole"))


@pytest.mark.slow  # >15s on the 1-core box
def test_tp_step_matches_dp_flagship_resnet_psp():
    """TP==DP on the FLAGSHIP architecture family: masked DynamicResNet +
    PSP head + concat-consuming aux head, at a SAMPLED subnet arch (masking
    active) — the shapes tensor parallelism must actually serve, not just a
    toy ViT. Also pins WHICH leaves sharded via the shard_report audit."""
    model = build_segmentor(FLAGSHIP_TINY)
    max_arch = model_max_arch(FLAGSHIP_TINY)
    sub = {"arch.backbone.stem.width": 8,
           "arch.backbone.body.width": [8, 8, 16, 24],
           "arch.backbone.body.depth": [1, 2, 2, 1]}
    arch = encode_arch(max_arch, sub)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (8, 32, 32, 3), F32)
    gt = jax.random.randint(rng, (8, 32, 32), 0, 6)
    sched = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 100)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9), None,
                         sched)
    # full step (stats + logs): exercises masked-BN stat updates under TP
    step = make_train_step(model, tx, update_stats=True, with_logs=True)

    results = {}
    for tp in (1, 2):
        mesh = make_mesh(model_parallel=tp)
        state = create_train_state(model, rng, img, arch, tx)
        state = shard_state(state, mesh, min_size=1) if tp > 1 \
            else replicate(state, mesh)
        if tp > 1:
            report = shard_report(state.params)
            # deep conv kernels output-shard; BN/bias leaves replicate
            assert "backbone_m/layer4/block0/conv2/kernel" in report
            assert "decode_head_m/bottleneck/conv/kernel" in report
            assert not any("/bn/" in k or "/scale" in k for k in report)
            assert len(report) >= 10
        batch = shard_batch({"img": img, "gt": gt}, mesh)
        state, logs = step(state, batch["img"], batch["gt"], arch, rng)
        results[tp] = (jax.tree_util.tree_map(np.asarray, state.params),
                       jax.tree_util.tree_map(np.asarray,
                                              state.batch_stats),
                       float(logs["decode.loss_seg"]))

    np.testing.assert_allclose(results[1][2], results[2][2], rtol=1e-5)
    for i in (0, 1):  # params AND the masked-BN running stats
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                    atol=1e-5),
            results[1][i], results[2][i])
