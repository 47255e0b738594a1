"""Property tests: masked dynamic ops == dense ops on physically sliced
weights (SURVEY.md §7 step 2). Float32 compute on CPU for exactness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaiaseg_tpu.ops import (DynBatchNorm, DynConv2d, DynLayerNorm, DynLinear,
                             channel_mask, depth_mask)
from gaiaseg_tpu.ops.blocks import DynBottleneck, DynConvModule

KEY = jax.random.PRNGKey(0)
F32 = jnp.float32


def test_channel_mask_values():
    m = channel_mask(3, 8)
    np.testing.assert_array_equal(np.asarray(m), [1, 1, 1, 0, 0, 0, 0, 0])
    d = depth_mask(jnp.asarray(2), 4)
    np.testing.assert_array_equal(np.asarray(d), [1, 1, 0, 0])


def test_dynconv_masked_equals_sliced():
    cmax, cout_max, w_in, w_out = 8, 16, 5, 11
    x = jax.random.normal(KEY, (2, 9, 9, cmax))
    x = x * channel_mask(w_in, cmax)  # invariant: input masked
    conv = DynConv2d(cout_max, 3, 1, dtype=F32)
    variables = conv.init(KEY, x)
    y = conv.apply(variables, x, channel_mask(w_out, cout_max))

    # dense reference: physically slice kernel to (3,3,w_in,w_out)
    k = variables["params"]["kernel"][:, :, :w_in, :w_out]
    ref = jax.lax.conv_general_dilated(
        x[..., :w_in], k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y[..., :w_out]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(y[..., w_out:]) == 0)


def test_dynconv_stride_dilation_groups():
    x = jax.random.normal(KEY, (1, 16, 16, 8))
    conv = DynCase = DynConv2d(8, 3, 2, dilation=2, dtype=F32)
    v = conv.init(KEY, x)
    y = conv.apply(v, x, None)
    assert y.shape == (1, 8, 8, 8)
    dw = DynConv2d(8, 7, 1, groups=8, dtype=F32)
    v = dw.init(KEY, x)
    assert dw.apply(v, x, None).shape == (1, 16, 16, 8)


def test_dynlinear_masked_equals_sliced():
    x = jax.random.normal(KEY, (4, 10)) * channel_mask(7, 10)
    lin = DynLinear(12, dtype=F32)
    v = lin.init(KEY, x)
    y = lin.apply(v, x, channel_mask(5, 12))
    ref = x[:, :7] @ v["params"]["kernel"][:7, :5] + v["params"]["bias"][:5]
    np.testing.assert_allclose(np.asarray(y[:, :5]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(y[:, 5:]) == 0)


def test_dynbn_matches_slice_bn_train_and_stats():
    cmax, w = 12, 7
    x = jax.random.normal(KEY, (4, 6, 6, cmax)) * channel_mask(w, cmax)
    bn = DynBatchNorm(cmax, dtype=F32)
    v = bn.init(KEY, x, use_running_average=False)
    mask = channel_mask(w, cmax)
    y, mut = bn.apply(v, x, mask, use_running_average=False,
                      mutable=["batch_stats"])
    # reference: per-channel batchnorm on the active slice
    xs = np.asarray(x[..., :w], np.float64)
    mean = xs.mean((0, 1, 2))
    var = xs.var((0, 1, 2))
    ref = (xs - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y[..., :w]), ref, rtol=1e-4,
                               atol=1e-4)
    assert np.all(np.asarray(y[..., w:]) == 0)
    # running stats updated ONLY for active channels
    new_mean = np.asarray(mut["batch_stats"]["mean"])
    assert np.all(new_mean[w:] == 0)
    n = xs[..., 0].size
    np.testing.assert_allclose(new_mean[:w], 0.9 * 0 + 0.1 * mean, rtol=1e-4)
    new_var = np.asarray(mut["batch_stats"]["var"])
    np.testing.assert_allclose(new_var[:w],
                               0.9 * 1 + 0.1 * var * n / (n - 1), rtol=1e-4)
    assert np.all(new_var[w:] == 1)


def test_dynbn_update_gate_freezes_stats():
    x = jax.random.normal(KEY, (2, 4, 4, 6))
    bn = DynBatchNorm(6, dtype=F32)
    v = bn.init(KEY, x, use_running_average=False)
    _, mut = bn.apply(v, x, None, use_running_average=False,
                      update_gate=jnp.asarray(False),
                      mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(mut["batch_stats"]["mean"]),
                                  np.zeros(6))


def test_dynln_masked_equals_sliced():
    cmax, w = 16, 9
    x = jax.random.normal(KEY, (3, 5, cmax)) * channel_mask(w, cmax)
    ln = DynLayerNorm(cmax, dtype=F32)
    v = ln.init(KEY, x)
    y = ln.apply(v, x, channel_mask(w, cmax))
    xs = np.asarray(x[..., :w], np.float64)
    mean = xs.mean(-1, keepdims=True)
    var = xs.var(-1, keepdims=True)
    ref = (xs - mean) / np.sqrt(var + 1e-6)
    np.testing.assert_allclose(np.asarray(y[..., :w]), ref, rtol=1e-4,
                               atol=1e-4)
    assert np.all(np.asarray(y[..., w:]) == 0)


def test_bottleneck_depth_inactive_is_identity():
    planes = 8
    x = jax.random.normal(KEY, (1, 8, 8, planes * 4))
    x = x * channel_mask(5 * 4, planes * 4)
    blk = DynBottleneck(planes, dtype=F32)
    width = jnp.asarray(5)
    out_mask = channel_mask(width * 4, planes * 4)
    v = blk.init(KEY, x, width, out_mask)
    y_off = blk.apply(v, x, width, out_mask, active=jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(y_off), np.asarray(x))
    y_on = blk.apply(v, x, width, out_mask, active=jnp.asarray(True))
    assert not np.allclose(np.asarray(y_on), np.asarray(x))


def test_bottleneck_downsample_shapes():
    blk = DynBottleneck(16, strides=2, has_downsample=True, dtype=F32)
    x = jax.random.normal(KEY, (1, 16, 16, 12))
    width = jnp.asarray(10)
    out_mask = channel_mask(width * 4, 64)
    v = blk.init(KEY, x, width, out_mask)
    y = blk.apply(v, x, width, out_mask)
    assert y.shape == (1, 8, 8, 64)
    assert np.all(np.asarray(y[..., 40:]) == 0)


def test_conv_module_bn_relu():
    m = DynConvModule(8, 3, norm="bn", act="relu", dtype=F32)
    x = jax.random.normal(KEY, (2, 6, 6, 4))
    v = m.init(KEY, x)
    y, _ = m.apply(v, x, channel_mask(6, 8), train=True,
                   mutable=["batch_stats"])
    assert y.shape == (2, 6, 6, 8)
    assert np.all(np.asarray(y) >= 0)
    assert np.all(np.asarray(y[..., 6:]) == 0)


@pytest.mark.parametrize("k,s,p,hw", [
    (7, 2, 3, (64, 96)),     # ResNet/Conformer 7x7/2 stem
    (3, 2, 1, (64, 96)),     # deep_stem (v1c) first 3x3/2 conv
    (4, 4, 0, (64, 64)),     # ConvNeXt 4x4/4 stem
    (16, 16, 0, (64, 64)),   # ViT/BEiT patchify (k == s)
])
def test_space_to_depth_conv_identity(k, s, p, hw):
    """space_to_depth_conv == lax strided conv, exactly (up to f32 order).

    This is the low-channel stem fast path DynConv2d takes for Ci<=8
    strided convs — the phase regrouping is an algebraic identity, so any
    drift here corrupts every backbone's stem silently."""
    from gaiaseg_tpu.ops.dynamic_layers import space_to_depth_conv
    rng = np.random.RandomState(k * 100 + s)
    x = jnp.asarray(rng.randn(2, hw[0], hw[1], 3), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, 3, 16), jnp.float32) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (s, s), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = space_to_depth_conv(x, w, (s, s), (p, p))
    assert ref.shape == got.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dynconv_stem_path_matches_dense_conv():
    """DynConv2d's low-channel W-phase stem path must match the plain
    strided conv it replaces (W%stride==0 triggers it here)."""
    m = DynConv2d(8, kernel_size=7, strides=2, dtype=F32)
    x = jax.random.normal(KEY, (1, 32, 32, 3))
    v = m.init(KEY, x)
    y_fast = m.apply(v, x)                      # 32%2==0 -> s2d path
    y_ref = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
