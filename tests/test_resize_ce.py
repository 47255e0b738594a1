"""Fused bilinear-upsample+CE Pallas kernel vs the XLA chain.

The kernel (ops/pallas/resize_ce.py) must be bit-level-compatible (f32)
with ``softmax_cross_entropy(resize_bilinear(logits, out_hw), label)`` —
the mmseg loss semantics (reference dynamic_decode_head.py:219-239) — for
plain CE (no class/pixel weights, reduction='mean', avg_non_ignore).
Runs in interpret mode on CPU; the compiled TPU path shares the same
kernel code (probed on-chip: loss diff 1.4e-6, grad maxdiff 6e-9).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaiaseg_tpu.models.losses.cross_entropy import softmax_cross_entropy
from gaiaseg_tpu.ops.pallas.resize_ce import (fused_resize_ce,
                                              supports_fused_resize_ce)
from gaiaseg_tpu.ops.resize import resize_bilinear


def _xla_loss(logits, label, out_hw):
    up = resize_bilinear(logits, out_hw, align_corners=False)
    return softmax_cross_entropy(up, label)


def _rand(n, h, w, c, H, W, seed=0, ignore_frac=0.1):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    lab = rng.randint(0, c, (n, H, W)).astype(np.int32)
    lab[rng.rand(n, H, W) < ignore_frac] = 255
    return logits, jnp.asarray(lab)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 19, 32, 32),     # production-like: f=4, square
    (1, 4, 6, 7, 16, 20),      # non-square, odd C, W factor != H factor
    (2, 3, 3, 5, 12, 9),       # h=3 minimum, W downscale-ish irregular
])
def test_fwd_and_grad_match_xla(shape):
    n, h, w, c, H, W = shape
    logits, lab = _rand(n, h, w, c, H, W)
    assert supports_fused_resize_ce((h, w), (H, W), False)

    ref = _xla_loss(logits, lab, (H, W))
    fus = fused_resize_ce(logits, lab, (H, W), 255, True)
    assert abs(float(ref) - float(fus)) < 1e-5

    g_ref = jax.grad(lambda lg: _xla_loss(lg, lab, (H, W)))(logits)
    g_fus = jax.grad(
        lambda lg: fused_resize_ce(lg, lab, (H, W), 255, True))(logits)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               atol=1e-7)


def test_all_ignored_is_zero_and_finite():
    logits, _ = _rand(1, 4, 4, 6, 16, 16)
    lab = jnp.full((1, 16, 16), 255, jnp.int32)
    loss, grad = jax.value_and_grad(
        lambda lg: fused_resize_ce(lg, lab, (16, 16), 255, True))(logits)
    assert float(loss) == 0.0
    assert float(jnp.max(jnp.abs(grad))) == 0.0


def test_bf16_logits_close():
    logits, lab = _rand(1, 8, 8, 19, 32, 32)
    lb = logits.astype(jnp.bfloat16)
    ref = _xla_loss(lb, lab, (32, 32))
    fus = fused_resize_ce(lb, lab, (32, 32), 255, True)
    # XLA path interpolates in bf16, kernel in f32 — bf16-level agreement
    assert abs(float(ref) - float(fus)) < 2e-2
    g = jax.grad(lambda x: fused_resize_ce(x, lab, (32, 32), 255, True))(lb)
    assert g.dtype == jnp.bfloat16 and bool(jnp.all(jnp.isfinite(
        g.astype(jnp.float32))))


def test_supports_gate():
    ok = supports_fused_resize_ce
    assert ok((8, 8), (32, 32), False)
    assert not ok((8, 8), (32, 32), True)     # align_corners
    assert not ok((8, 8), (36, 32), False)    # non-integer row factor
    assert not ok((8, 8), (24, 32), False)    # odd row factor (3)
    assert not ok((2, 8), (8, 32), False)     # <3 source rows
    assert not ok((8, 8), (8, 32), False)     # factor 1 (nothing to fuse)


def test_segmentor_fused_loss_matches_unfused():
    """forward_train with fused_loss=True (interpret) == the XLA path.

    in_index picked so decode logits are 4x4 (f=8) and aux 8x8 (f=4) at a
    32x32 label — both through the fused kernel's supports gate."""
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    model_cfg = dict(
        type="DynamicEncoderDecoder",
        backbone=dict(type="DynamicResNet", stem_width=8,
                      body_width=[8, 16, 24, 32], body_depth=[2, 2, 3, 2],
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), dtype=jnp.float32),
        decode_head=dict(type="DynamicPSPHead", in_index=1, channels=16,
                         pool_scales=(1, 2), dropout_ratio=0.0,
                         num_classes=7, align_corners=False,
                         dtype=jnp.float32,
                         loss_decode=dict(type="CrossEntropyLoss",
                                          loss_weight=1.0)),
        auxiliary_head=dict(type="DynamicFCNHead", in_index=0, channels=8,
                            num_convs=1, concat_input=False,
                            dropout_ratio=0.0, num_classes=7,
                            dtype=jnp.float32,
                            loss_decode=dict(type="CrossEntropyLoss",
                                             loss_weight=0.4)),
        test_cfg=dict(mode="whole"),
    )
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    gt = rng.randint(0, 7, (1, 32, 32)).astype(np.int32)
    gt[:, :4] = 255
    gt = jnp.asarray(gt)
    arch = encode_arch(model_max_arch(model_cfg))
    k = jax.random.PRNGKey(0)

    totals = {}
    for fused in (False, True):
        cfg = dict(model_cfg, fused_loss=fused)
        model = build_segmentor(cfg)
        variables = model.init({"params": k, "dropout": k}, img, gt, arch,
                               compute_acc=False, method="forward_train")
        (tot, logs), _ = model.apply(
            variables, img, gt, arch, compute_acc=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"], method="forward_train")
        assert "decode.loss_seg" in logs and "aux_0.loss_seg" in logs
        totals[fused] = float(tot)
    assert abs(totals[True] - totals[False]) < 1e-4, totals
