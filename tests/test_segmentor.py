"""End-to-end supernet segmentor tests on a tiny config: shapes, masking,
zero-recompile arch switching, slide-vs-whole consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaiaseg_tpu.models import (build_segmentor, encode_arch, model_max_arch)

F32 = jnp.float32

TINY_MODEL = dict(
    type="DynamicEncoderDecoder",
    backbone=dict(
        type="DynamicResNet",
        stem_width=8,
        body_width=[8, 16, 24, 32],
        body_depth=[2, 2, 3, 2],
        strides=(1, 2, 2, 2),
        dilations=(1, 1, 1, 1),
        out_indices=(0, 1, 2, 3),
        dtype=F32,
    ),
    decode_head=dict(
        type="DynamicPSPHead",
        in_index=3,
        channels=16,
        pool_scales=(1, 2),
        dropout_ratio=0.1,
        num_classes=7,
        align_corners=False,
        dtype=F32,
        loss_decode=dict(type="CrossEntropyLoss", loss_weight=1.0),
    ),
    auxiliary_head=dict(
        type="DynamicFCNHead",
        in_index=2,
        channels=8,
        num_convs=1,
        concat_input=False,
        dropout_ratio=0.1,
        num_classes=7,
        dtype=F32,
        loss_decode=dict(type="CrossEntropyLoss", loss_weight=0.4),
    ),
    test_cfg=dict(mode="whole"),
)

SUB_META = {"arch.backbone.stem.width": 8,
            "arch.backbone.body.width": [8, 8, 16, 16],
            "arch.backbone.body.depth": [1, 1, 2, 1]}


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_segmentor(TINY_MODEL)
    img = jnp.zeros((1, 32, 32, 3), F32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    arch = encode_arch(model_max_arch(TINY_MODEL))
    k = jax.random.PRNGKey(0)
    variables = model.init({"params": k, "dropout": k}, img, gt, arch,
                           method="forward_train")
    return model, variables


def test_forward_shapes_and_masking(model_and_vars):
    model, variables = model_and_vars
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3), F32)
    max_arch = model_max_arch(TINY_MODEL)
    arch = encode_arch(max_arch)
    logit = model.apply(variables, img, arch)
    assert logit.shape == (1, 32, 32, 7)

    feats = model.apply(variables, img, arch, train=False,
                        method=model.extract_feat)
    assert [f.shape for f in feats] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 96), (1, 1, 1, 128)]

    # subnet arch: stage outputs masked beyond active width*4
    sub = encode_arch(max_arch, SUB_META)
    feats_sub = model.apply(variables, img, sub, train=False,
                            method=model.extract_feat)
    f1 = np.asarray(feats_sub[1])
    assert np.all(f1[..., 8 * 4:] == 0)
    assert np.any(f1[..., : 8 * 4] != 0)


def test_arch_switch_zero_recompile(model_and_vars):
    model, variables = model_and_vars
    img = jnp.zeros((1, 32, 32, 3), F32)
    max_arch = model_max_arch(TINY_MODEL)

    @jax.jit
    def fwd(v, im, arch):
        return model.apply(v, im, arch)

    fwd(variables, img, encode_arch(max_arch))
    n_compiles = fwd._cache_size()
    fwd(variables, img, encode_arch(max_arch, SUB_META))
    fwd(variables, img, encode_arch(max_arch, {
        "arch.backbone.body.depth": [2, 1, 3, 2]}))
    assert fwd._cache_size() == n_compiles  # same compiled graph for all


@pytest.mark.slow  # >15s on the 1-core box
def test_forward_train_losses(model_and_vars):
    model, variables = model_and_vars
    img = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3), F32)
    gt = jax.random.randint(jax.random.PRNGKey(3), (2, 32, 32), 0, 7)
    gt = gt.at[:, :4].set(255)  # ignore region
    arch = encode_arch(model_max_arch(TINY_MODEL))
    (total, logs), mut = model.apply(
        variables, img, gt, arch, method=model.forward_train,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(4)})
    assert np.isfinite(float(total))
    assert "decode.loss_seg" in logs and "aux_0.loss_seg" in logs
    assert 0.0 <= float(logs["decode.acc_seg"]) <= 1.0
    # grads flow
    def loss_fn(params):
        (t, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, gt, arch, method=model.forward_train,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(4)})
        return t
    g = jax.grad(loss_fn)(variables["params"])
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_slide_matches_whole_when_single_window(model_and_vars):
    model, variables = model_and_vars
    img = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3), F32)
    arch = encode_arch(model_max_arch(TINY_MODEL))
    whole = model.apply(variables, img, arch, method=model.whole_inference)
    slide = model.apply(variables, img, arch, (32, 32), (32, 32),
                        method=model.slide_inference)
    np.testing.assert_allclose(np.asarray(slide), np.asarray(whole),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # >15s on the 1-core box
def test_slide_overlapping_windows(model_and_vars):
    model, variables = model_and_vars
    img = jax.random.normal(jax.random.PRNGKey(6), (1, 48, 48, 3), F32)
    arch = encode_arch(model_max_arch(TINY_MODEL))
    out = model.apply(variables, img, arch, (32, 32), (16, 16),
                      method=model.slide_inference)
    assert out.shape == (1, 48, 48, 7)
    assert np.all(np.isfinite(np.asarray(out)))
    pred = model.apply(variables, img, arch, method=model.simple_test)
    assert pred.shape == (1, 48, 48)


def test_aug_test_multiscale(model_and_vars):
    model, variables = model_and_vars
    arch = encode_arch(model_max_arch(TINY_MODEL))
    img1 = jax.random.normal(jax.random.PRNGKey(7), (1, 32, 32, 3), F32)
    img2 = jax.image.resize(img1, (1, 48, 48, 3), "bilinear")
    pred = model.apply(variables, [img1, img2], arch, True,
                       method=model.aug_test)
    assert pred.shape == (1, 32, 32)
    single = model.apply(variables, img1, arch, method=model.simple_test)
    assert pred.dtype == single.dtype


def test_simple_test_fast_path_matches_softmax_argmax(model_and_vars):
    """simple_test(flip=False) skips the softmax (argmax is invariant under
    it); predictions must equal argmax of the softmax ``inference`` path in
    both whole and slide modes."""
    model, variables = model_and_vars
    img = jax.random.normal(jax.random.PRNGKey(8), (1, 48, 48, 3), F32)
    arch = encode_arch(model_max_arch(TINY_MODEL), SUB_META)
    fast = model.apply(variables, img, arch, method=model.simple_test)
    ref = jnp.argmax(model.apply(variables, img, arch,
                                 method=model.inference), -1)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))

    slide_model = build_segmentor(dict(
        TINY_MODEL, test_cfg=dict(mode="slide", crop_size=(32, 32),
                                  stride=(16, 16))))
    fast = slide_model.apply(variables, img, arch,
                             method=slide_model.simple_test)
    ref = jnp.argmax(slide_model.apply(variables, img, arch,
                                       method=slide_model.inference), -1)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))
