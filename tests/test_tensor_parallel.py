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
                                       shard_state, tp_spec)
from jax.sharding import PartitionSpec as P

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
